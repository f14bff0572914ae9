package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compensating checks for the oracle-less q_sketch_rollup (DuckDB has no
  * DataSketches-HLL twin): merge-consistency, error envelope, and
  * re-grouping equivalence — the properties that make stored sketches
  * trustworthy as a distinct-count substitute at scale. */
class SketchesSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  test("merged weekly sketches == one direct sketch over all events (bit-exact estimates)") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        date_trunc("week", col("ts")).as("week"))
    val viaMerge = ev.groupBy("event_type", "week")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val m = viaMerge.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val d = direct.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m === d)
  }

  test("estimates stable under repartitioning (register max is order-free)") {
    val ev = graft.Tables(spark, dir, "events")
    def est(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est(ev) === est(ev.repartition(17, col("user_id"))))
    assert(est(ev) === est(ev.repartition(3)))
  }

  test("q_sketch_rollup: rel_err within the lgK=12 envelope, exact column exact") {
    val rows = graft.SparkEntry.queries("q_sketch_rollup")(spark, dir).collect()
    assert(rows.nonEmpty)
    // lgK=12 HLL: ~1.6/sqrt(2^12) ≈ 2.5% std error; 5% is a >2σ envelope
    rows.foreach { r =>
      assert(r.getDouble(4) < 0.05, s"${r.getString(0)}: rel_err ${r.getDouble(4)}")
    }
    // the exact twin must equal a straight countDistinct
    val exact = graft.Tables(spark, dir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach(r => assert(r.getLong(3) === exact(r.getString(0))))
  }

  test("CMS: distributed agg == driver-built sketch; estimate never below exact") {
    import graft.functions.CmsEstimate.cmsEstimate
    val ev = graft.Tables(spark, dir, "events")
      .filter(col("event_type") === "click").select("user_id")
    val skBytes = ev.repartition(7)
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val distributed = org.apache.spark.util.sketch.CountMinSketch.readFrom(skBytes)
    val driver = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 42)
    val vals = ev.collect().map(_.getLong(0))
    vals.foreach(v => driver.add(java.lang.Long.valueOf(v)))
    val exact = vals.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    exact.keys.take(20).foreach { k =>
      val key = java.lang.Long.valueOf(k)
      assert(distributed.estimateCount(key) === driver.estimateCount(key),
        s"agg and driver sketch disagree on $k")
      assert(distributed.estimateCount(key) >= exact(k),
        s"CMS under-counted $k")
    }
  }

  test("CMS: mistyped inputs fail at analysis, not in an executor") {
    import graft.functions.CmsEstimate.cmsEstimate
    val sk = graft.Tables(spark, dir, "events")
      .agg(expr("count_min_sketch(user_id, 0.01d, 0.9d, 42)").as("sk"))
    // INT key (not BIGINT) → analysis-time type error (Spark 4 surfaces
    // it as ExtendedAnalysisException, not the sql-api AnalysisException)
    val e1 = intercept[Exception] {
      sk.select(cmsEstimate(col("sk"), lit(7))).queryExecution.analyzed
    }
    assert(e1.getMessage.toLowerCase.contains("bigint"), e1.getMessage)
    // non-binary sketch column → analysis-time type error
    val e2 = intercept[Exception] {
      sk.select(cmsEstimate(lit("not a sketch"), lit(7L)))
        .queryExecution.analyzed
    }
    assert(e2.getMessage.toLowerCase.contains("binary"), e2.getMessage)
  }

  test("q_cms_freq: within_eps reported, est >= exact on every probe") {
    val rows = graft.SparkEntry.queries("q_cms_freq")(spark, dir).collect()
    assert(rows.length === 25) // 5 types x 5 probe users
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        s"${r.getString(0)}/${r.getLong(1)}: est below exact")
    }
  }
}
