package graft.ops

import graft.SparkSpec

/** Exact-integer time-series kernels: the EWMA fold equals a plain-Scala
  * replay of the recursion, and the anomaly filter is exactly the >2σ
  * set computed driver-side in BigInt (both directions — no missed
  * hours, no false flags). */
class TimeSeriesSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("ewma fold == plain-Scala recursion per type") {
    val rows = TimeSeries.qEwmaHourly(spark, dir).collect()
      .map(r => (r.getString(0), r.get(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((_, series) <- rows.groupBy(_._1)) {
      // output is ordered (event_type, h); replay s_t = (x_t + s_t-1)/2
      var prev = -1L
      for ((_, _, cents, ewma) <- series) {
        val expect = if (prev < 0) cents else (cents + prev) / 2
        assert(ewma === expect)
        prev = ewma
      }
    }
  }

  test("anomaly set is exactly the >2-sigma hours, both directions") {
    import org.apache.spark.sql.functions._
    val hourly = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(graft.Tables.dec(col("value"))), 0).cast("bigint")
        .as("units"))
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    val flagged = TimeSeries.qAnomalyHours(spark, dir).collect()
      .map(r => (r.getString(0), r.get(1).toString)).toSet
    assert(flagged.nonEmpty)
    for ((t, rows) <- hourly.groupBy(_._1)) {
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val q = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum
      for ((_, h, x) <- rows) {
        val lhs = (n * x - s) * (n * x - s)
        val rhs = 4 * (n * q - s * s)
        assert(flagged.contains((t, h)) === (lhs > rhs),
          s"$t $h: lhs=$lhs rhs=$rhs flagged=${flagged.contains((t, h))}")
      }
    }
  }
}
