package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the data-skipping property z-order exists for: every bucket
  * bounds BOTH dimensions, where a 1-D sort leaves the second dimension
  * full-width. */
class ZOrderSpec extends SparkSpec {

  test("z-buckets bound both dims ~4x tighter; 1-D sort leaves partkey full-width") {
    val dir = sf("sf0.001")
    val li = graft.Tables(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
    val (okRange, pkRange) = {
      val r = li.agg(max("l_orderkey") - min("l_orderkey"),
        max("l_partkey") - min("l_partkey")).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    val z = ZOrder.qZorderLayout(spark, dir).collect()
    assert(z.length == 16)
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val zOk = avg(z.map(r => (r.getLong(3) - r.getLong(2)).toDouble))
    val zPk = avg(z.map(r => (r.getLong(5) - r.getLong(4)).toDouble))
    // top-4 morton bits fix 2 high quantized bits of EACH dim: average
    // per-bucket range must be well under half the global range in BOTH
    // (the quantization denominator rounds regions up, hence 0.5 not 0.25)
    assert(zOk < 0.5 * okRange, s"zOk=$zOk of $okRange")
    assert(zPk < 0.5 * pkRange, s"zPk=$zPk of $pkRange")
    // contrast: bucket the same table by the orderkey SORT ORDER (16
    // equal-width key ranges): orderkey ranges collapse but partkey stays
    // ~full-width per bucket — the layout z-order strictly improves on
    val denom = li.agg((max(col("l_orderkey")) + 1).as("okden"))
    val lin = li.crossJoin(broadcast(denom))
      .withColumn("bucket", expr("(l_orderkey * 16) div okden"))
      .groupBy("bucket")
      .agg(min("l_partkey").as("a"), max("l_partkey").as("b"))
      .collect()
    val linPk = avg(lin.map(r => (r.getLong(2) - r.getLong(1)).toDouble))
    assert(linPk > 0.9 * pkRange, s"linPk=$linPk of $pkRange")
    assert(zPk < 0.6 * linPk)
  }
}
