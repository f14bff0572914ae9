package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Error envelopes for the sketch queries. Since round 10 the queries
  * themselves carry the envelope as within-tolerance booleans (the
  * driver's oracle asserts them TRUE — see qApproxPercentile scaladoc),
  * so this spec (a) asserts the booleans hold on the fixture and (b)
  * recomputes the raw sketch-vs-exact relative error independently, so a
  * tolerance literal loosened by accident would still show up here. */
class ApproxSketchSpec extends SparkSpec {

  test("q_approx_percentile: tolerance booleans hold and the raw sketch " +
    "tracks exact within 1%") {
    val rows = Relational.qApproxPercentile(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"status=${r.getString(0)} tolerance boolean false")
    }
    // Independent envelope: recompute the sketch next to the exact value.
    val raw = Tables(spark, sf("sf0.01"), "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("e50"),
        expr("percentile_approx(o_totalprice, 0.5, 10000)").as("a50"),
        expr("percentile(o_totalprice, 0.9)").as("e90"),
        expr("percentile_approx(o_totalprice, 0.9, 10000)").as("a90"))
      .collect()
    raw.foreach { r =>
      Seq((1, 2), (3, 4)).foreach { case (e, a) =>
        val (exact, approx) = (r.getDouble(e), r.getDouble(a))
        assert(math.abs(approx - exact) / math.abs(exact) < 0.01,
          s"status=${r.getString(0)} exact=$exact approx=$approx")
      }
    }
  }

  test("q_approx_distinct: tolerance booleans hold and the raw HLL " +
    "tracks exact distinct counts within 5%") {
    val rows = Relational.qApproxDistinct(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"flag=${r.getString(0)} tolerance boolean false")
    }
    val raw = Tables(spark, sf("sf0.01"), "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("e_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("a_parts"),
        countDistinct(col("l_suppkey")).as("e_supps"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("a_supps"))
      .collect()
    raw.foreach { r =>
      Seq((1, 2), (3, 4)).foreach { case (e, a) =>
        val (exact, approx) = (r.getLong(e), r.getLong(a))
        assert(math.abs(approx - exact).toDouble / exact < 0.05,
          s"flag=${r.getString(0)} exact=$exact approx=$approx")
      }
    }
  }
}
