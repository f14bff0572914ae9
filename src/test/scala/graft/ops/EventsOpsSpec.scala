package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Sliding-window and outlier-labeling semantics over the events stream,
  * checked against independently computed references (the DuckDB oracle
  * gates cross-engine parity; these pin the SEMANTICS). */
class EventsOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("sliding windows: every event lands in exactly two windows") {
    val nEvents = Tables(spark, dir, "events").count()
    val windowed = Relational.qSlidingWindow(spark, dir)
      .agg(sum(col("n"))).head().getLong(0)
    assert(windowed == 2 * nEvents)
  }

  test("sliding windows: tumbling buckets are the even-slide subset's refinement") {
    // summing the two sliding windows that start at each 1h boundary
    // double-counts events vs tumbling, but every tumbling bucket's count
    // equals the sum of its two half-hour tumbling sub-buckets; cheap
    // consistency: total value mass of sliding = 2x tumbling mass
    val tumbling = Relational.qEventsWindow(spark, dir)
      .agg(sum(col("total_value"))).head().getDouble(0)
    val sliding = Relational.qSlidingWindow(spark, dir)
      .agg(sum(col("total_value"))).head().getDouble(0)
    assert(math.abs(sliding - 2 * tumbling) < 1e-6, s"$sliding vs 2*$tumbling")
  }

  test("outlier labels match a driver-side recomputation") {
    val rows = Relational.qOutlierEvents(spark, dir).collect()
    val byType = rows.groupBy(_.getString(1))
    for ((_, rs) <- byType) {
      val xs = rs.map(r => BigDecimal(r.getDouble(2)).setScale(2))
      val n = xs.length
      val s = xs.sum
      val q = xs.map(x => x * x).sum
      for (r <- rs) {
        val x = BigDecimal(r.getDouble(2)).setScale(2)
        val dev = n * x - s
        val want = if (dev * dev > 9 * (n * q - s * s)) 1 else 0
        assert(r.getInt(3) == want, s"event ${r.getLong(0)}")
      }
    }
  }

  test("outliers are rare and extreme: flagged values sit outside the bulk") {
    val rows = Relational.qOutlierEvents(spark, dir).collect()
    val frac = rows.count(_.getInt(3) == 1).toDouble / rows.length
    // 3-sigma labeling must flag a small minority (Chebyshev bound 1/9)
    assert(frac < 0.12, s"outlier fraction $frac")
  }

  test("quality gate: pass is exactly the conjunction of its rule flags") {
    val rows = TextOps.qQualityGate(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val flags = Seq("r_len", "r_mean", "r_sym", "r_stop")
        .map(c => r.getInt(r.fieldIndex(c)))
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getInt(r.fieldIndex("pass")) == flags.product)
    }
    // the gate must actually separate: some docs pass, some fail
    val passed = rows.count(r => r.getInt(r.fieldIndex("pass")) == 1)
    assert(passed > 0 && passed < rows.length,
      s"gate degenerate: $passed/${rows.length}")
  }
}
