package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the distributed unigram-LM trainer against an INDEPENDENT
  * single-machine reference implementation (the BpeSpec discipline):
  * plain-Scala seed statistics, integer scores, Viterbi DP and hard-EM
  * refinement, written without reference to the engine's expression
  * machinery. The DuckDB oracle already re-derives the same chain in
  * SQL, so a bug would have to fool three independent implementations
  * identically to pass. */
class UnigramSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  // ---- reference implementation (independent of the engine code) ----

  private def refScore(c: Long, total: Long): Long = {
    val r = ((BigInt(c) << 18) / BigInt(total)) max BigInt(1)
    (r.pow(4).bitLength - 1).toLong - 72
  }

  /** Viterbi over one word under (piece → score): best (score, tokens)
    * per prefix; ties prefer the LONGER piece (distinct lengths at one
    * position are distinct candidates; equal lengths are the same
    * piece). */
  private def refVit(w: String, s: Map[String, Long]): (Long, List[String]) = {
    val best = new Array[(Long, List[String])](w.length + 1)
    best(0) = (0L, Nil)
    for (j <- 1 to w.length) {
      var top: (Long, Int, String) = null
      for (l <- 1 to math.min(4, j)) {
        val p = w.substring(j - l, j)
        if (s.contains(p) && best(j - l) != null) {
          val sc = best(j - l)._1 + s(p)
          if (top == null || sc > top._1 || (sc == top._1 && l > top._2))
            top = (sc, l, p)
        }
      }
      best(j) =
        if (top == null) null
        else (top._1, best(j - top._2)._2 :+ top._3)
    }
    best(w.length)
  }

  private def refTrain(words: Seq[(String, Long)])
      : (Seq[(String, Long, Long)], Map[String, List[String]]) = {
    val seed = scala.collection.mutable.Map.empty[String, Long]
    for ((w, wc) <- words; l <- 1 to math.min(4, w.length);
         i <- 0 to w.length - l)
      seed.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + wc))
    val top = seed.toSeq.sortBy { case (p, c) => (-c, p) }.take(64)
    val chars = seed.toSeq.filter(_._1.length == 1)
    val p0 = (top ++ chars).distinctBy(_._1)
    val c0 = p0.map(_._2).sum
    val s0 = p0.map { case (p, c) => p -> refScore(c, c0) }.toMap
    val u1 = scala.collection.mutable.Map.empty[String, Long]
    for ((w, wc) <- words; t <- refVit(w, s0)._2)
      u1.updateWith(t)(c => Some(c.getOrElse(0L) + wc))
    val p1 = u1.toSeq ++ chars.collect {
      case (p, _) if !u1.contains(p) => (p, 0L)
    }
    val c1 = p1.map(_._2).sum
    val model = p1.sortBy(_._1)
      .map { case (p, c) => (p, c, refScore(c, c1)) }
    val s1 = model.map { case (p, _, s) => p -> s }.toMap
    (model, words.map { case (w, _) => w -> refVit(w, s1)._2 }.toMap)
  }

  // -------------------------------------------------------------------

  private def fixtureWords(): Seq[(String, Long)] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(explode(TextOps.tokens(lower(col("text")))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 12)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)].collect().toSeq
  }

  test("trained model equals the independent reference (pieces, counts, scores)") {
    val words = fixtureWords()
    val (refModel, refSeg) = refTrain(words)
    val m = Unigram.model(spark, dir)
    assert(m.pieces === refModel.map { case (p, c, s) => (p, c, s) }
      .sortBy(_._1),
      "model diverged from the reference EM")
    // final segmentation matches per word, and always re-concatenates
    import spark.implicits._
    val seg = Unigram.sharedSeg(spark, dir)
      .select(col("w"), col("toks")).as[(String, Seq[String])]
      .collect().toMap
    assert(seg.keySet === refSeg.keySet)
    seg.foreach { case (w, toks) =>
      assert(toks.toList === refSeg(w), s"segmentation of '$w'")
      assert(toks.mkString === w, s"'$w' does not re-concatenate")
    }
  }

  test("vocab query is deterministic and self-consistent with the encode query") {
    val a = Unigram.qUnigramLm(spark, dir).collect()
    val b = Unigram.qUnigramLm(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // Σ per-language n_tokens == Σ vocab usage weighted into the corpus:
    // every corpus word ≤ 12 chars is segmented, so total tokens in the
    // encode view equals the total piece usage re-weighted by corpus
    // (not vocab) frequency — checked via the shared segmentation
    import spark.implicits._
    val ntok = Unigram.sharedSeg(spark, dir)
      .select(col("w"), size(col("toks")).as("n"))
      .as[(String, Int)].collect().toMap
    val corpusTotal = fixtureWords().map { case (w, wc) => ntok(w) * wc }.sum
    val encTotal = Unigram.qUnigramEncode(spark, dir).collect()
      .map(_.getLong(3)).sum
    assert(encTotal === corpusTotal)
  }
}
