package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-code retrieval (q_hamming_rerank): the packed-BIGINT sign
  * code's xor+popcount must equal the per-dimension sign-mismatch
  * count bit for bit (the DuckDB oracle recomputes the unpacked form;
  * this pins the same identity in-JVM on adversarial vectors — exact
  * zeros, sign flips at bit 0 and bit 63, all-negative), and the
  * query's recall arithmetic must be internally consistent. */
class HammingSpec extends SparkSpec {

  private val packExpr =
    """aggregate(transform(sequence(0, 63), i ->
      |  IF(element_at(embedding, i + 1) >= 0, shiftleft(1L, i), 0L)),
      |0L, (a, x) -> a + x)""".stripMargin

  test("packed xor+popcount == per-dimension sign-mismatch count") {
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = vec()
    // adversarial pairs: identical, bit-0 flip, bit-63 flip, exact-zero
    // dims (>= 0 counts as set on both sides), all-negative, random
    val vs: Seq[(Int, Array[Float])] = Seq(
      1 -> base,
      2 -> base.clone(),
      3 -> { val v = base.clone(); v(0) = -v(0).abs - 1e-3f; v },
      4 -> { val v = base.clone(); v(63) = -v(63).abs - 1e-3f; v },
      5 -> base.map(x => if (x.abs < 0.5f) 0f else x),
      6 -> Array.fill(64)(-1f),
      7 -> vec(), 8 -> vec()
    )
    import spark.implicits._
    val df = vs.toDF("vec_id", "embedding")
      .withColumn("code", expr(packExpr))
    val codes = df.select("vec_id", "code").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // brute-force mismatch per pair vs packed popcount, via Spark's
    // own bit_count on the literal codes (same codegen path the query
    // uses)
    for ((ia, va) <- vs; (ib, vb) <- vs if ia < ib) {
      val brute = (0 until 64).count(i => (va(i) >= 0) != (vb(i) >= 0))
      val packed = java.lang.Long.bitCount(codes(ia) ^ codes(ib))
      assert(packed === brute, s"pair ($ia,$ib)")
      val viaSpark = spark.sql(
        s"SELECT bit_count(${codes(ia)}L ^ ${codes(ib)}L)").head().getInt(0)
      assert(viaSpark === brute, s"spark bit_count pair ($ia,$ib)")
    }
  }

  test("q_hamming_rerank output is internally consistent") {
    val r = Vectors.qHammingRerank(spark, sf("sf0.001")).head()
    val (nq, np, nh, bp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nq > 0 && np >= nq, s"truth set degenerate: nq=$nq np=$np")
    assert(nh >= 0 && nh <= np, s"hits out of range: $nh of $np")
    assert(bp === nh * 10000L / np, "recall_bp arithmetic drifted")
  }
}
