package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** URL canonicalization + URL-level dedup — the crawl-frontier side of a
  * training-data pipeline (every web corpus dedups fetch targets before
  * it dedups content; the same page arrives as
  * `HTTP://WWW.Example.COM:80/a%61b/?b=2&a=1#frag` and
  * `http://example.com/aab?a=1&b=2`).
  *
  * The fixture ships no URL column, so [[UrlGen]] synthesizes
  * deterministic MESSY urls from doc_id (the mediaTable pattern —
  * documents stand in for a crawl log): mixed-case scheme/host, an
  * optional `www.` prefix, explicit default ports, rotated query-param
  * order, percent-encoded unreserved path bytes, trailing slashes and
  * fragments — every mangle a canonicalizer must undo, keyed so that
  * distinct raw spellings of the same logical page exist in the corpus.
  *
  * Canonicalization (RFC 3986 §6 normalization + the usual crawl
  * conventions), all codegen built-ins — lower/regexp/url_decode/
  * array_sort — in ONE narrow map, no shuffle:
  *   1. scheme + host lowercased;        2. `www.` stripped;
  *   3. default port dropped (http:80, https:443), others kept;
  *   4. percent-escapes decoded in the path (the generator emits only
  *      unreserved escapes, so full decode == the RFC's
  *      decode-unreserved-only; a literal '+' is pre-escaped to %2B
  *      first because Spark's url_decode is form-encoding — it would
  *      turn '+' into a space, which RFC 3986 path decoding does not);
  *   5. trailing path slash stripped (root `/` kept);
  *   6. query params sorted bytewise;    7. fragment dropped.
  *
  * The DuckDB oracles RE-DERIVE the canonical form independently
  * (regexp_extract parsing, a split-on-% hex chr() rebuild for the
  * decode — the media-oracle idiom — list_sort for the params), so a
  * canonicalization bug on either side breaks the hash. */
object Urls {

  /** Deterministic messy-URL generator: same logical page (site, page)
    * surfaces under different mangles for different doc_ids. */
  object UrlGen {
    def siteFor(id: Long): Int = (id % 23).toInt
    def pageFor(id: Long): Int = (id % 11).toInt

    def urlFor(id: Long): String = {
      val site = siteFor(id); val page = pageFor(id)
      // scheme is a property of the SITE, not the crawl event — same
      // logical page must share a canonical form across its spellings
      val https = site % 2 == 1
      val scheme0 = if (https) "https" else "http"
      val scheme = (id % 4) match {
        case 1 => scheme0.toUpperCase
        case 2 => scheme0.capitalize
        case _ => scheme0
      }
      val www = if (id % 3 == 0) "www." else ""
      val host0 = s"${www}site$site.example.com"
      val host = (id % 5) match {
        case 1 => host0.toUpperCase
        case 2 => host0.split('.').map(_.capitalize).mkString(".")
        case _ => host0
      }
      val port = (id % 4) match {
        case 2 => if (https) ":443" else ":80" // explicit default: drop
        case 3 if id % 8 == 7 => ":8080" // non-default: KEEP
        case _ => ""
      }
      // params depend only on (site, page) — order rotates by id
      val params =
        Seq(s"a=$page", s"b=$site", s"c=${(site + page) % 7}")
      val rotated = {
        val r = (id % 3).toInt
        params.drop(r) ++ params.take(r)
      }
      val pathPage =
        if (id % 4 == 3) s"p%61ge$page" // %61 = 'a': decodes to "page<p>"
        else s"page$page"
      val trail = if (id % 4 == 3) "/" else ""
      val frag = if (id % 4 == 2) s"#sec${id % 3}" else ""
      s"$scheme://$host$port/docs/$pathPage$trail?${rotated.mkString("&")}$frag"
    }
  }

  /** The session-shared (doc_id, url) crawl-log table. */
  private[graft] def urlTable(spark: SparkSession, dir: String): DataFrame =
    Tables.materializeSharedBy(spark, "urls", dir) {
      import spark.implicits._
      Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, UrlGen.urlFor(id))))
        .toDF("doc_id", "url")
    }

  // ---- parsing (identical regexes on the Spark and DuckDB sides) ----
  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([^:/?#]+)://", 1))
  private def hostportOf(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://([^/?#]+)", 1)
  private def hostOf(u: Column): Column =
    lower(regexp_replace(hostportOf(u), ":[0-9]+$", ""))
  private def portOf(u: Column): Column =
    regexp_extract(hostportOf(u), ":([0-9]+)$", 1)
  private def pathOf(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://[^/?#]+([^?#]*)", 1)
  private def queryOf(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)
  private def fragmentOf(u: Column): Column =
    regexp_extract(u, "#(.*)$", 1)

  /** RFC 3986 %XX-only decode of a path: Spark's url_decode implements
    * application/x-www-form-urlencoded semantics ('+' → space), which
    * the DuckDB oracle's %XX-rebuild does not share — pre-escape any
    * literal '+' to %2B so url_decode leaves it untouched. */
  private def pathDecode(p: Column): Column =
    url_decode(regexp_replace(p, "\\+", "%2B"))

  /** Canonical URL per the scaladoc rules — one codegen expression. */
  private[ops] def canonicalize(u: Column): Column = {
    val scheme = schemeOf(u)
    val host0 = hostOf(u)
    val host = regexp_replace(host0, "^www\\.", "")
    val port0 = portOf(u)
    val isDefault = (scheme === "http" && port0 === "80") ||
      (scheme === "https" && port0 === "443")
    val port = when(port0 === "" || isDefault, lit(""))
      .otherwise(concat(lit(":"), port0))
    val path0 = pathDecode(pathOf(u))
    val path1 = when(path0 === "", lit("/")).otherwise(path0)
    // strip ONE trailing slash unless the path IS the root
    val pathC = when(path1 === "/", path1)
      .otherwise(regexp_replace(path1, "/$", ""))
    val q0 = queryOf(u)
    val qSorted = array_join(array_sort(split(q0, "&")), "&")
    val query = when(q0 === "", lit("")).otherwise(concat(lit("?"), qSorted))
    concat(scheme, lit("://"), host, port, pathC, query)
  }

  /** Per-doc parse audit: every component the canonicalizer consumes,
    * one row per URL, ordered by doc_id — the field-level parity query. */
  def qUrlParse(spark: SparkSession, dir: String): DataFrame = {
    val t = urlTable(spark, dir)
    graft.OracleExport.export(t, "urls", dir)
    t.select(col("doc_id"), col("url"),
        schemeOf(col("url")).as("scheme"),
        hostOf(col("url")).as("host"),
        when(portOf(col("url")) === "", lit(-1))
          .otherwise(portOf(col("url")).cast("int")).as("port"),
        pathDecode(pathOf(col("url"))).as("path"),
        array_join(array_sort(split(queryOf(col("url")), "&")), "&")
          .as("query_sorted"),
        when(fragmentOf(col("url")) === "", lit("-"))
          .otherwise(fragmentOf(col("url"))).as("fragment"))
      .orderBy("doc_id")
  }

  /** URL-level dedup: group the crawl log by canonical URL — n_docs per
    * logical page, how many distinct raw spellings collapsed into it,
    * and the first doc as the survivor (the crawl-frontier dedup step). */
  def qUrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val t = urlTable(spark, dir)
    graft.OracleExport.export(t, "urls", dir)
    t.select(col("doc_id"), col("url"),
        canonicalize(col("url")).as("url_canon"))
      .groupBy("url_canon")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("url")).as("n_raw_variants"),
        min(col("doc_id")).as("survivor_doc"))
      .orderBy("url_canon")
  }

  /** Deterministic robots-exclusion rules per site (the crawl-policy
    * side of the frontier): RFC 9309 semantics — path-PREFIX matching,
    * the LONGEST matching rule wins, and on a length tie Allow wins.
    * Rule mix per site id:
    *   site % 4 == 0           → no rules (everything allowed);
    *   otherwise               → Disallow "/docs" + Allow "/docs/page<site%11>"
    *                             (the longest-match override);
    *   site % 3 == 2           → + Disallow "/docs/page<(site+1)%11>"
    *                             (specific disallow beating the broad one
    *                             is a no-op; beating an ALLOW of equal
    *                             length is the tie case);
    *   site % 5 == 1           → + Allow "/docs/page<(site+2)%11>"
    *                             AND Disallow of the SAME prefix — the
    *                             RFC tie, resolved to Allow.
    * Note "/docs/page1" prefix-matches "/docs/page10" too — real robots
    * semantics, preserved identically in the SQL oracle. */
  object RobotsGen {
    /** (ruleType, pathPrefix) list for a site. */
    def rulesFor(site: Int): Seq[(String, String)] =
      if (site % 4 == 0) Seq.empty
      else {
        val base = Seq(
          "disallow" -> "/docs",
          "allow" -> s"/docs/page${site % 11}")
        val extra1 =
          if (site % 3 == 2) Seq("disallow" -> s"/docs/page${(site + 1) % 11}")
          else Seq.empty
        val extra2 =
          if (site % 5 == 1) Seq(
            "allow" -> s"/docs/page${(site + 2) % 11}",
            "disallow" -> s"/docs/page${(site + 2) % 11}")
          else Seq.empty
        base ++ extra1 ++ extra2
      }
  }

  /** Robots-exclusion filtering of the canonicalized crawl log: per URL,
    * the RFC 9309 verdict (longest matching rule; Allow on ties; allowed
    * when nothing matches). ONE broadcast join of the tiny per-site rule
    * table against the canonical (site, path) columns + a per-doc max —
    * at 100 TB the rules stay a broadcast (robots corpora are millions
    * of rows, not billions) and the scan stays a single pass. */
  def qRobotsFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = urlTable(spark, dir)
    graft.OracleExport.export(t, "urls", dir)
    val canon = t.select(col("doc_id"), canonicalize(col("url")).as("c"))
      .select(col("doc_id"),
        regexp_extract(col("c"), "site([0-9]+)\\.", 1).cast("int").as("site"),
        regexp_extract(col("c"), "^[^:/?#]+://[^/?#]+([^?#]*)", 1).as("path"))
    val rules = (0 until 23).flatMap(s =>
        RobotsGen.rulesFor(s).map { case (rt, pre) => (s, rt, pre) })
      .toDF("site", "rtype", "prefix")
    // longest match wins; tie → allow (rank allow above disallow at the
    // same length). The struct max is the one-pass argmax idiom.
    val matched = canon.join(broadcast(rules), Seq("site"))
      .filter(col("path").startsWith(col("prefix")))
      .groupBy("doc_id")
      .agg(max(struct(length(col("prefix")).as("l"),
        (col("rtype") === "allow").cast("int").as("isallow"),
        col("prefix").as("prefix"))).as("w"))
      .select(col("doc_id"),
        when(col("w.isallow") === 1, lit("allow")).otherwise(lit("disallow"))
          .as("mverdict"),
        col("w.prefix").as("mprefix"))
    canon.join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("site"), col("path"),
        coalesce(col("mverdict"), lit("allow")).as("verdict"),
        coalesce(col("mprefix"), lit("-")).as("win_prefix"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_parse" -> qUrlParse _,
    "q_url_dedup" -> qUrlDedup _,
    "q_robots_filter" -> qRobotsFilter _)

  // DuckDB-side percent-decode: split on '%', first piece literal, every
  // later piece starts with two hex digits — chr() them back (media-
  // oracle hex idiom; the generator guarantees every '%' is an escape)
  private def decodeSql(e: String): String =
    s"""array_to_string(list_transform(string_split($e, '%'),
       |  (s, i) -> CASE WHEN i = 1 THEN s
       |    ELSE chr(CAST('0x' || substr(s, 1, 2) AS INT)) || substr(s, 3)
       |  END), '')""".stripMargin

  private val parseCte =
    s"""u AS (
       |  SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([^:/?#]+)://', 1)) AS scheme,
       |    regexp_extract(url, '^[^:/?#]+://([^/?#]+)', 1) AS hostport,
       |    regexp_extract(url, '^[^:/?#]+://[^/?#]+([^?#]*)', 1) AS rawpath,
       |    regexp_extract(url, '\\?([^#]*)', 1) AS rawq,
       |    regexp_extract(url, '#(.*)$$', 1) AS frag
       |  FROM '${graft.OracleExport.oraclePath("urls")}'),
       |p AS (
       |  SELECT doc_id, url, scheme,
       |    lower(regexp_replace(hostport, ':[0-9]+$$', '')) AS host,
       |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
       |    ${decodeSql("rawpath")} AS path,
       |    array_to_string(list_sort(string_split(rawq, '&')), '&')
       |      AS query_sorted,
       |    rawq, frag
       |  FROM u)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_url_parse" ->
      s"""WITH $parseCte
         |SELECT doc_id, url, scheme, host,
         |  CAST(CASE WHEN port = '' THEN -1 ELSE CAST(port AS INT) END
         |       AS INT) AS port,
         |  path, query_sorted,
         |  CASE WHEN frag = '' THEN '-' ELSE frag END AS fragment
         |FROM p ORDER BY doc_id""".stripMargin,
    // rules RE-GENERATED in SQL from the site id (range 23 + the same
    // residue classes), canonical path re-derived from the raw strings,
    // and the RFC 9309 longest-match/tie-to-allow argmax mirrored as a
    // window rank — fully independent of the engine's broadcast join
    "q_robots_filter" ->
      s"""WITH $parseCte,
         |sites AS (SELECT CAST(range AS INT) AS site FROM range(23)),
         |rules AS (
         |  SELECT site, 'disallow' AS rtype, '/docs' AS prefix
         |  FROM sites WHERE site % 4 <> 0
         |  UNION ALL
         |  SELECT site, 'allow', '/docs/page' || CAST(site % 11 AS VARCHAR)
         |  FROM sites WHERE site % 4 <> 0
         |  UNION ALL
         |  SELECT site, 'disallow',
         |    '/docs/page' || CAST((site + 1) % 11 AS VARCHAR)
         |  FROM sites WHERE site % 4 <> 0 AND site % 3 = 2
         |  UNION ALL
         |  SELECT site, 'allow',
         |    '/docs/page' || CAST((site + 2) % 11 AS VARCHAR)
         |  FROM sites WHERE site % 4 <> 0 AND site % 5 = 1
         |  UNION ALL
         |  SELECT site, 'disallow',
         |    '/docs/page' || CAST((site + 2) % 11 AS VARCHAR)
         |  FROM sites WHERE site % 4 <> 0 AND site % 5 = 1),
         |cu AS (
         |  SELECT doc_id,
         |    CAST(regexp_extract(host, 'site([0-9]+)\\.', 1) AS INT) AS site,
         |    CASE WHEN path = '' THEN '/'
         |      WHEN path <> '/' THEN regexp_replace(path, '/$$', '')
         |      ELSE path END AS cpath
         |  FROM p),
         |mw AS (
         |  SELECT cu.doc_id, r.rtype, r.prefix,
         |    row_number() OVER (PARTITION BY cu.doc_id
         |      ORDER BY length(r.prefix) DESC,
         |        CASE WHEN r.rtype = 'allow' THEN 1 ELSE 0 END DESC,
         |        r.prefix DESC) AS rn
         |  FROM cu JOIN rules r ON r.site = cu.site
         |  WHERE starts_with(cu.cpath, r.prefix)),
         |m AS (SELECT doc_id, rtype, prefix FROM mw WHERE rn = 1)
         |SELECT cu.doc_id, cu.site, cu.cpath AS path,
         |  COALESCE(m.rtype, 'allow') AS verdict,
         |  COALESCE(m.prefix, '-') AS win_prefix
         |FROM cu LEFT JOIN m USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_url_dedup" ->
      s"""WITH $parseCte,
         |c AS (
         |  SELECT doc_id, url,
         |    scheme || '://' || regexp_replace(host, '^www\\.', '') ||
         |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
         |           OR (scheme = 'https' AND port = '443')
         |      THEN '' ELSE ':' || port END ||
         |    CASE WHEN path = '' THEN '/'
         |      WHEN path <> '/' THEN regexp_replace(path, '/$$', '')
         |      ELSE path END ||
         |    CASE WHEN rawq = '' THEN '' ELSE '?' || query_sorted END
         |      AS url_canon
         |  FROM p)
         |SELECT url_canon, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT url) AS n_raw_variants,
         |  MIN(doc_id) AS survivor_doc
         |FROM c GROUP BY url_canon ORDER BY url_canon""".stripMargin)
}
