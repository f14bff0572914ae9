package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q_stats_regression against an exact-arithmetic reference: the moments
  * are re-accumulated driver-side as BigDecimals (order-independent,
  * exact), converted to doubles once, and pushed through the identical
  * closed-form expressions — the distributed result must match BIT FOR
  * BIT, which is the operator's whole claim (deterministic regression
  * under any partitioning). */
class StatsRegressionSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("regression slope/intercept/r2 match exact-decimal brute force bitwise") {
    val out = Relational.qStatsRegression(spark, dir).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.size >= 2)

    val rows = graft.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_discount").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val byFlag = rows.groupBy(_._1)
    byFlag.foreach { case (flag, rs) =>
      def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val n = rs.length.toLong
      val sq = rs.map(r => d2(r._2)).sum.toDouble
      val sd = rs.map(r => d2(r._3)).sum.toDouble
      val sqq = rs.map(r => d2(r._2) * d2(r._2)).sum.toDouble
      val sdd = rs.map(r => d2(r._3) * d2(r._3)).sum.toDouble
      val sqd = rs.map(r => d2(r._2) * d2(r._3)).sum.toDouble
      val slope = (n * sqd - sq * sd) / (n * sqq - sq * sq)
      val intercept = (sd - slope * sq) / n
      val r2 = ((n * sqd - sq * sd) * (n * sqd - sq * sd)) /
        ((n * sqq - sq * sq) * (n * sdd - sd * sd))
      val (on, oslope, ointercept, or2) = out(flag)
      assert(on == n)
      assert(oslope == slope, s"slope $flag")
      assert(ointercept == intercept, s"intercept $flag")
      assert(or2 == r2, s"r2 $flag")
    }
    // regression on this corpus must be non-degenerate to be a real test
    assert(out.values.exists(v => v._2 != 0.0 && !v._2.isNaN))
    out.values.foreach { case (_, _, _, r2) =>
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
    }
  }
}
