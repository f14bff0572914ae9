package graft.ops

import graft.SparkSpec

/** Pins the distributed BPE trainer against an independent
  * single-machine reference implementation of the Sennrich-style
  * algorithm (word-frequency dict, greedy left-to-right merge apply,
  * argmax ties broken by (count desc, left asc, right asc)) on the
  * sf0.001 corpus, plus unit properties of the merge fold. */
class BpeSpec extends SparkSpec {

  /** Reference: word-freq map → n merge steps, all in plain Scala. */
  private def referenceBpe(
      wordFreq: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordFreq.groupMapReduce { case (w, _) => w.map(_.toString).toVector } {
        case (_, c) => c }(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.size - 1)
        counts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, cnt))
        words = words.groupMapReduce { case (syms, _) =>
          // greedy left-to-right non-overlapping merge of (a, b)
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          } } { case (_, c) => c }(_ + _)
      }
    }
    out.result()
  }

  test("merge sequence equals the reference implementation on sf0.001") {
    import spark.implicits._
    val wf = Bpe.wordFreq(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toMap
    assert(wf.nonEmpty)
    val expected = referenceBpe(wf, 12).zipWithIndex.map {
      case ((a, b, c), i) => (i + 1, a, b, a + b, c) }
    val got = Bpe.merges(spark, sf("sf0.001"), 12)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q_bpe_pairs top pair equals the reference step-1 argmax") {
    import spark.implicits._
    val wf = Bpe.wordFreq(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toMap
    val (a, b, cnt) = referenceBpe(wf, 1).head
    val top = Bpe.qBpePairs(spark, sf("sf0.001"))
      .as[(String, Long)].head()
    assert(top == (a + b, cnt))
  }

  test("encode equals applying the reference merge list to the raw corpus") {
    import spark.implicits._
    val wf = Bpe.wordFreq(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toMap
    val merges = referenceBpe(wf, 12).map { case (a, b, _) => (a, b) }
    def encode(word: String): Int =
      merges.foldLeft(word.map(_.toString).toVector) { case (syms, (a, b)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }.size
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
      .select("lang", "text").as[(String, String)].collect()
    val expected = docs
      .flatMap { case (lang, text) =>
        text.toLowerCase.split("\\s+").filter(_.matches("^[a-z]+$"))
          .map(w => (lang, w)) }
      .groupBy(_._1)
      .map { case (lang, ws) =>
        val words = ws.map(_._2)
        val toks = words.map(encode(_).toLong).sum
        val chars = words.map(_.length.toLong).sum
        (lang, words.length.toLong, toks, chars, chars.toDouble / toks) }
      .toSeq.sortBy(_._1)
    val got = Bpe.qBpeEncode(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("encodeExpr handles a 256-entry merge table (constant plan depth)") {
    // the r11 shape nested one aggregate() per merge and would blow the
    // expression tree at real-tokenizer merge counts; the rewritten
    // expression folds the merges as DATA. 256 merges (16x16 letter
    // pairs + chained multi-char merges) applied to adversarial words,
    // pinned against the plain-Scala greedy fold.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val base = for (a <- 'a' to 'p'; b <- 'a' to 'p')
      yield (a.toString, b.toString)
    // chain merges so learned tokens merge with neighbors ("ab"+"cd"...)
    val merges = (base.take(250) ++ Seq(
      ("ab", "cd"), ("abcd", "e"), ("abcde", "fg"), ("zz", "z"),
      ("hi", "jk"), ("lm", "no"))).toSeq
    assert(merges.size == 256)
    def ref(word: String): Seq[String] =
      merges.foldLeft(word.map(_.toString).toVector) { case (syms, (a, b)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }.toSeq
    val words = Seq("abcdefghijklmnop", "aaaa", "zzzz", "abcdecdab",
      "hijklmno", "ppppa", "qrstuv", "a", "")
    val got = words.toDF("w")
      .select(col("w"), expr(Bpe.encodeExpr(merges)).as("toks"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toSeq)).toMap
    words.foreach { w =>
      assert(got(w) == ref(w), s"word '$w': ${got(w)} != ${ref(w)}")
    }
    // and the 12-merge production path is THE SAME expression shape
    assert(Bpe.encodeExpr(merges.take(12)).contains("named_struct"))
  }

  test("merge apply is greedy left-to-right non-overlapping (aaa case)") {
    // the fold inside merges() must produce [aa, a] for "aaa" + (a, a);
    // checked through the public API on a crafted one-word corpus is
    // overkill — exercise the same SQL fold expression directly instead
    val df = spark.sql(
      """SELECT aggregate(array('a', 'a', 'a'), CAST(array() AS ARRAY<STRING>),
        |  (acc, x) -> IF(size(acc) > 0
        |                 AND element_at(acc, -1) = 'a' AND x = 'a',
        |    concat(slice(acc, 1, size(acc) - 1), array('aa')),
        |    concat(acc, array(x)))) AS r""".stripMargin)
    assert(df.collect().head.getSeq[String](0) == Seq("aa", "a"))
  }
}
