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
  * Driver gate: hash-gated via [[graft.OracleExport]] (promoted from
  * rows-only in r12). DuckDB has no DataSketches-HLL twin, so the
  * per-type ESTIMATES are exported (deterministic — see above) and the
  * oracle recomputes everything else from the raw events: the per-type
  * event counts, the exact distincts, and the realized relative error.
  * Only the sketch kernel itself is taken from the engine, and
  * SketchesSpec pins that (merge==direct bit-exact, error envelope,
  * re-grouping equivalence) — the same split as minhash/winnow/bpe.
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
    // the estimates are the one engine-defined piece — export them for
    // the DuckDB oracle (estimates are repartition-deterministic, so the
    // export equals the query's own recompute bit-for-bit)
    graft.OracleExport.export(
      merged.select("event_type", "approx_users"), "sketchest", dir)
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

  /** The estimates come from the export (engine-defined sketch kernel,
    * spec-pinned); counts, exact distincts and the realized error are
    * recomputed by DuckDB from the raw events. */
  val oracles: Map[String, String] = Map(
    "q_sketch_rollup" ->
      s"""WITH est AS (SELECT event_type, approx_users
         |            FROM '${graft.OracleExport.oraclePath("sketchest")}'),
         |ex AS (SELECT event_type, COUNT(*) AS n_events,
         |         COUNT(DISTINCT user_id) AS exact_users
         |       FROM events GROUP BY event_type)
         |SELECT e.event_type, ex.n_events, e.approx_users, ex.exact_users,
         |  ROUND(ABS(e.approx_users - ex.exact_users) / ex.exact_users, 4)
         |    AS rel_err
         |FROM est e JOIN ex ON e.event_type = ex.event_type
         |ORDER BY e.event_type""".stripMargin)
}
