package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable-sketch rollups: store sketches, not raw keys.
  *
  * The 100 TB pattern this demonstrates: a pipeline that needs distinct
  * counts at several grains (day → week → all-time; per source → global)
  * must NOT rescan raw events per grain. Instead the ingest job persists a
  * constant-size mergeable sketch per finest-grain cell, and every coarser
  * rollup is a sketch MERGE over the tiny cell table — cost O(cells), not
  * O(events), and re-aggregatable to any grouping after the raw data has
  * been archived. Spark 4's Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) are
  * codegen'd Catalyst expressions with algebraic partials, so the sketch
  * build is itself a two-phase aggregate (map-side partial sketches merge
  * into reduce-side sketches — no raw-key shuffle; the exchange carries
  * one lgK=12 sketch per group per mapper).
  *
  * Estimates are DETERMINISTIC under repartitioning: an HLL register
  * array is a per-bucket MAX over hashed keys, so build/merge order
  * cannot change the result ([[SketchesSpec]] pins merged == direct).
  * Unlike [[Relational.qApproxDistinct]]'s one-shot approx_count_distinct
  * (Spark-internal HLL++, not storable), these sketches round-trip
  * through BINARY columns — the weekly table here stands in for a
  * persisted parquet artifact.
  *
  * Driver gate: rows-only BY DESIGN (DuckDB has no DataSketches-HLL
  * twin, so no SQL oracle can reproduce the estimates). Compensating
  * checks in SketchesSpec: merge-consistency (bit-exact), error envelope
  * vs the exact distinct (the query itself carries the exact twin and
  * its relative error), and re-grouping equivalence.
  */
object Sketches {

  /** Per-type distinct users via weekly-sketch merge, with the exact
    * count and realized relative error alongside. Three grains in one
    * output pass, all from ONE finest-grain sketch table. */
  def qSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        date_trunc("week", col("ts")).as("week"))
    // finest grain: (type, week) cell sketches — what ingest would persist
    val weekly = ev.groupBy("event_type", "week")
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))
    // coarse grain: merge cell sketches per type — never re-reads events
    val merged = weekly.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("approx_users"),
        sum(col("n_events")).as("n_events"))
    // exact twin (the audit a pipeline runs once, not per rollup)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_events"), col("approx_users"),
        col("exact_users"),
        round(abs(col("approx_users") - col("exact_users")) /
          col("exact_users"), 4).as("rel_err"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_rollup" -> qSketchRollup _)

  /** No oracle: see scaladoc — rows-only by design. */
  val oracles: Map[String, String] = Map.empty
}
