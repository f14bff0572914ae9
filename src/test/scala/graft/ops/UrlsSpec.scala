package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** URL canonicalization: the generator really produces every mangle, the
  * canonicalizer undoes them all (pinned against an independent
  * java.net-based reference), canonicalization is idempotent, and messy
  * spellings of the same logical page genuinely collapse. */
class UrlsSpec extends SparkSpec {

  /** Independent reference canonicalizer — java.net.URI parsing +
    * URLDecoder, no shared code with the Column implementation. */
  private def refCanon(u: String): String = {
    val m = "^([^:/?#]+)://([^/?#]+)([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$".r
    val m(scheme0, hostport, path0, query0, _) = u
    val scheme = scheme0.toLowerCase
    val (host0, port0) = hostport.lastIndexOf(':') match {
      case i if i >= 0 && hostport.drop(i + 1).forall(_.isDigit) =>
        (hostport.take(i), hostport.drop(i + 1))
      case _ => (hostport, "")
    }
    val host = host0.toLowerCase.stripPrefix("www.")
    val port =
      if (port0.isEmpty || (scheme == "http" && port0 == "80") ||
        (scheme == "https" && port0 == "443")) ""
      else ":" + port0
    val dec = java.net.URLDecoder.decode(path0, "UTF-8")
    val path1 = if (dec.isEmpty) "/" else dec
    val path = if (path1 != "/" && path1.endsWith("/")) path1.dropRight(1)
      else path1
    val query = Option(query0).filter(_.nonEmpty)
      .map(q => "?" + q.split("&", -1).sorted.mkString("&")).getOrElse("")
    s"$scheme://$host$port$path$query"
  }

  test("generator emits every mangle; canonicalize == independent java.net reference") {
    import spark.implicits._
    val ids = (0L until 400L)
    val urls = ids.map(Urls.UrlGen.urlFor)
    // coverage: the corpus really contains each messy feature
    assert(urls.exists(_.startsWith("HTTP")), "no uppercase scheme")
    assert(urls.exists(u => u.contains(":80/") || u.contains(":443/")),
      "no explicit default port")
    assert(urls.exists(_.contains(":8080/")), "no non-default port")
    assert(urls.exists(_.contains("%61")), "no percent escape")
    assert(urls.exists(_.contains("#sec")), "no fragment")
    assert(urls.exists(_.contains("/?") || u0trail(urls)), "no trailing slash")
    assert(urls.exists(_.toLowerCase.contains("://www.")), "no www prefix")
    val got = ids.map(i => (i, Urls.UrlGen.urlFor(i))).toDF("id", "url")
      .select(col("id"), Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- ids)
      assert(got(i) === refCanon(Urls.UrlGen.urlFor(i)), s"id=$i")
  }
  private def u0trail(urls: Seq[String]): Boolean =
    urls.exists(u => u.takeWhile(_ != '?').endsWith("/"))

  /** Independent RFC 9309 reference: longest matching prefix wins, ties
    * go to Allow, no match allows. */
  private def refVerdict(site: Int, path: String): (String, String) = {
    val ms = Urls.RobotsGen.rulesFor(site).filter(r => path.startsWith(r._2))
    if (ms.isEmpty) ("allow", "-")
    else {
      val (rt, pre) = ms.maxBy { case (rt, pre) =>
        (pre.length, if (rt == "allow") 1 else 0, pre)
      }
      (rt, pre)
    }
  }

  test("robots filter: RFC 9309 longest-match semantics == independent reference; all rule paths exercised") {
    import spark.implicits._
    val df = spark.range(0, 400).toDF("id")
      .selectExpr("id AS doc_id", "id AS x")
    // drive the REGISTERED query shape over generated urls by checking
    // every (site, page) combination directly through the reference
    val verdicts = for (site <- 0 until 23; page <- 0 until 11) yield
      (site, s"/docs/page$page", refVerdict(site, s"/docs/page$page"))
    // coverage: every semantic branch occurs in the fixture universe
    assert(verdicts.exists { case (s, _, (v, p)) => v == "allow" && p == "-" },
      "no no-rules site")
    assert(verdicts.exists { case (_, _, (v, p)) => v == "disallow" && p == "/docs" },
      "no broad-disallow verdict")
    assert(verdicts.exists { case (_, _, (v, p)) =>
      v == "allow" && p.startsWith("/docs/page") }, "no longest-match allow")
    // the tie case: a site where allow and disallow share the SAME prefix
    val tieSites = (0 until 23).filter(s =>
      Urls.RobotsGen.rulesFor(s).groupBy(_._2).exists(_._2.map(_._1).toSet
        == Set("allow", "disallow")))
    assert(tieSites.nonEmpty, "no tie-configured site")
    for (s <- tieSites) {
      val pre = Urls.RobotsGen.rulesFor(s).groupBy(_._2)
        .find(_._2.map(_._1).toSet == Set("allow", "disallow")).get._1
      assert(refVerdict(s, pre)._1 === "allow", s"tie at site $s not allow")
    }
    // and the engine agrees with the reference on the real fixture rows
    val got = Urls.qRobotsFilter(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (v, p) = refVerdict(r.getInt(1), r.getString(2))
      assert((r.getString(3), r.getString(4)) === ((v, p)),
        s"doc ${r.getLong(0)} site ${r.getInt(1)} path ${r.getString(2)}")
    }
    val byVerdict = got.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(byVerdict.getOrElse("allow", 0) > 0 &&
      byVerdict.getOrElse("disallow", 0) > 0,
      s"fixture verdicts one-sided: $byVerdict")
  }

  test("canonicalization is idempotent and collapses variant spellings") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, Urls.UrlGen.urlFor(i)))
      .toDF("id", "url")
    val once = df.select(col("id"), Urls.canonicalize(col("url")).as("c"))
    val twice = once.select(col("id"), Urls.canonicalize(col("c")).as("c2"),
      col("c"))
    assert(twice.filter(col("c") =!= col("c2")).count() === 0,
      "canonicalize is not idempotent")
    // messy spellings genuinely collapse: some canonical group holds >1
    // DISTINCT raw url
    val collapsed = df.select(Urls.canonicalize(col("url")).as("c"),
        col("url"))
      .groupBy("c").agg(countDistinct(col("url")).as("n"))
      .filter(col("n") > 1).count()
    assert(collapsed > 0, "no canonical group with multiple raw spellings")
  }

  test("a literal '+' in the path stays a '+' (RFC 3986, not form-encoding)") {
    import spark.implicits._
    // Spark's url_decode is application/x-www-form-urlencoded ('+' →
    // space); the oracle's %XX-rebuild leaves '+' literal — the
    // canonicalizer pre-escapes '+' so both sides agree (ADVICE r14)
    val df = Seq(
      (1L, "http://site.example.com/a+b/c"),
      (2L, "http://site.example.com/a%2Bb/c"),
      (3L, "http://site.example.com/sp%61ce+x")).toDF("id", "url")
    val got = df.select(col("id"), Urls.canonicalize(col("url")).as("c"))
      .orderBy("id").collect().map(_.getString(1))
    assert(got(0) === "http://site.example.com/a+b/c", got(0))
    // %2B decodes to a literal '+' — same canonical form as the raw '+'
    assert(got(1) === got(0), s"${got(1)} != ${got(0)}")
    assert(got(2) === "http://site.example.com/space+x", got(2))
  }
}
