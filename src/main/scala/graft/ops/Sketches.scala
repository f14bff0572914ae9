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

  /** Cohort-overlap report via THETA sketch set algebra (see
    * [[graft.functions.ThetaSketchAgg]]): per event type, the cohort of
    * users with a high-value event (value > 180), then for every type
    * pair the overlap / union / exclusive counts — answered entirely
    * from the 5-row sketch table. At 100 TB the sketches are the stored
    * artifact and this query never touches raw events; here the cohort
    * sketches build in one scan (map-side partial sketches, one tiny
    * shuffle of sketch bytes). The pair expansion is a deliberate
    * non-equi self-join of a 5-ROW table (BNLJ-allowlisted like the
    * other bounded scalar broadcasts). Gate: below 4096 distinct keys
    * theta sketches are EXACT, so the DuckDB oracle is plain exact set
    * algebra over the raw table — a full hash gate, no export needed;
    * ThetaSpec pins the >4096 sampling-mode envelope separately. */
  def qSketchSetops(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaSketchAgg.{thetaSketch, thetaEstimate, thetaSetOp}
    val cohorts = Tables(spark, dir, "events")
      .filter(col("value") > 180)
      .groupBy("event_type")
      .agg(thetaSketch(col("user_id")).as("sk"))
    val a = cohorts.select(col("event_type").as("type_a"), col("sk").as("sk_a"))
    val b = cohorts.select(col("event_type").as("type_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        thetaEstimate(col("sk_a")).as("users_a"),
        thetaEstimate(col("sk_b")).as("users_b"),
        thetaSetOp(col("sk_a"), col("sk_b"), "intersect").as("n_both"),
        thetaSetOp(col("sk_a"), col("sk_b"), "union").as("n_either"),
        thetaSetOp(col("sk_a"), col("sk_b"), "anotb").as("n_only_a"))
      .orderBy("type_a", "type_b")
  }

  /** Count-Min frequency audit: per-type CMS sketches of user activity
    * (eps=0.001, conf=0.99, fixed seed — counters are additive, so the
    * sketch is partition-order deterministic), probed for the 5 globally
    * hottest users via [[graft.functions.CmsEstimate]], with the exact
    * count and the one-sided error bound (exact ≤ est ≤ exact+⌈eps·N⌉,
    * the bound holding with prob ≥ conf per probe) alongside. The
    * production shape: the sketch table is the stored per-ingest
    * artifact and any later "how often did key X occur in partition Y"
    * probe is O(1) per cell — no raw re-scan, unlike the exact twin
    * computed here as the audit. Gate: like q_sketch_rollup, the
    * engine-defined ESTIMATES are exported (deterministic) and DuckDB
    * recomputes exacts, counts, and the bound check from raw events;
    * the kernel itself is pinned in SketchesSpec (merge == direct,
    * estimate never below exact). */
  def qCmsFreq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsEstimate.cmsEstimate
    val ev = Tables(spark, dir, "events").select(col("event_type"), col("user_id"))
    val sk = ev.groupBy("event_type")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_events"))
    // deterministic probe set: globally hottest users, ties by id
    val hot = ev.groupBy("user_id").agg(count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("user_id")).limit(5)
      .select("user_id")
    // 5 types × 5 probes: bounded BNLJ expansion of two tiny tables
    val est = sk.join(broadcast(hot), col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"), col("n_events"),
        cmsEstimate(col("sk"), col("user_id")).as("est"))
    graft.OracleExport.export(
      est.select("event_type", "user_id", "est"), "cmsest", dir)
    val exact = ev.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("event_type", "user_id"), "left")
      .select(col("event_type"), col("user_id"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("est") <= coalesce(col("exact"), lit(0L)) +
          ceil(lit(0.001) * col("n_events"))).cast("int").as("within_eps"))
      .orderBy("event_type", "user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_rollup" -> qSketchRollup _,
    "q_sketch_setops" -> qSketchSetops _,
    "q_cms_freq" -> qCmsFreq _)

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
         |ORDER BY e.event_type""".stripMargin,
    "q_sketch_setops" ->
      """WITH co AS (SELECT DISTINCT event_type, user_id FROM events
        |            WHERE value > 180),
        |c AS (SELECT event_type, COUNT(*) AS u FROM co GROUP BY 1),
        |isect AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |            COUNT(*) AS n
        |          FROM co a JOIN co b ON a.user_id = b.user_id
        |            AND a.event_type < b.event_type
        |          GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |  ca.u AS users_a, cb.u AS users_b,
        |  COALESCE(i.n, 0) AS n_both,
        |  ca.u + cb.u - COALESCE(i.n, 0) AS n_either,
        |  ca.u - COALESCE(i.n, 0) AS n_only_a
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN isect i
        |  ON i.ta = ca.event_type AND i.tb = cb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "q_cms_freq" ->
      s"""WITH est AS (SELECT event_type, user_id, est
         |            FROM '${graft.OracleExport.oraclePath("cmsest")}'),
         |n AS (SELECT event_type, COUNT(*) AS n_events FROM events
         |      GROUP BY 1),
         |ex AS (SELECT event_type, user_id, COUNT(*) AS exact FROM events
         |       GROUP BY 1, 2)
         |SELECT e.event_type, e.user_id, e.est,
         |  COALESCE(ex.exact, 0) AS exact,
         |  CAST(e.est <= COALESCE(ex.exact, 0)
         |    + CAST(CEILING(0.001 * n.n_events) AS BIGINT) AS INT)
         |    AS within_eps
         |FROM est e
         |JOIN n ON n.event_type = e.event_type
         |LEFT JOIN ex ON ex.event_type = e.event_type
         |  AND ex.user_id = e.user_id
         |ORDER BY e.event_type, e.user_id""".stripMargin)
}
