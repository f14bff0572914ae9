package graft.ops

import graft.SparkSpec

/** Error envelopes for the sketch queries whose outputs are rows-only at
  * the driver gate (sketch internals are engine-specific, so no DuckDB
  * twin): the approximate columns must sit close to the exact columns
  * computed in the same row. */
class ApproxSketchSpec extends SparkSpec {

  test("percentile_approx tracks exact percentiles within 1% relative error") {
    val rows = Relational.qApproxPercentile(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq((1, 2), (3, 4)).foreach { case (e, a) =>
        val (exact, approx) = (r.getDouble(e), r.getDouble(a))
        assert(math.abs(approx - exact) / math.abs(exact) < 0.01,
          s"status=${r.getString(0)} exact=$exact approx=$approx")
      }
    }
  }

  test("approx_count_distinct tracks exact distinct counts within 5%") {
    val rows = Relational.qApproxDistinct(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq((1, 2), (3, 4)).foreach { case (e, a) =>
        val (exact, approx) = (r.getLong(e), r.getLong(a))
        assert(math.abs(approx - exact).toDouble / exact < 0.05,
          s"flag=${r.getString(0)} exact=$exact approx=$approx")
      }
    }
  }
}
