package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series analytics over the events stream — the monitoring pair a
  * pipeline runs on every ingest batch: exponential smoothing (trend)
  * and statistical outlier flagging (alerting). Both are EXACT-integer
  * formulations so they hash-gate against DuckDB: float smoothing or a
  * float stddev would diverge across summation orders and engines,
  * which is the same reason the fixed-point trick already carries
  * [[Graph.pagerank]].
  *
  * Scale shapes: the only fact-sized stage in either query is the
  * hourly pre-aggregation (one map-side-combining shuffle on
  * (type, hour) — the corpus-size reduction). Downstream of it the data
  * is |types| × |hours| rows: the EWMA fold is row-local per type over
  * its sorted hourly array (bounded by the retention window, never by
  * corpus size), and the anomaly pass joins the hourly table to a
  * 5-row broadcast stats side. */
object TimeSeries {

  /** Hourly totals per type in integer CENTS: SUM over exact
    * DECIMAL(18,2) values, ×100 → an exact integer under any partition
    * order, in any engine. */
  private def hourlyCents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(Tables.dec(col("value"))) * 100).cast("bigint").as("cents"))

  /** EWMA with α = 1/2 over each type's hourly revenue, in integer cents
    * with floor halving: s₁ = x₁, sₜ = (xₜ + sₜ₋₁) div 2 — deterministic
    * bit-for-bit (all quantities non-negative, so Spark's `div` and
    * DuckDB's `//` agree). The recursion is inherently sequential IN t,
    * so it runs as a row-local fold over the type's sorted hourly array
    * — per-type series length is the retention window (720 h here), not
    * corpus size; types fold in parallel. The oracle replays the same
    * recursion as a recursive CTE. */
  def qEwmaHourly(spark: SparkSession, dir: String): DataFrame =
    hourlyCents(spark, dir)
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("h"), col("cents"))))
        .as("series"))
      .select(col("event_type"), expr(
        """explode(zip_with(series,
          |  aggregate(series, CAST(array() AS ARRAY<BIGINT>),
          |    (acc, e) -> acc || array(CASE WHEN size(acc) = 0 THEN e.cents
          |      ELSE (e.cents + element_at(acc, -1)) div 2 END)),
          |  (s, w) -> named_struct('h', s.h, 'cents', s.cents,
          |                         'ewma_c', w))) AS r""".stripMargin))
      .select(col("event_type"), col("r.h").as("h"),
        col("r.cents").as("cents"), col("r.ewma_c").as("ewma_c"))
      .orderBy("event_type", "h")

  /** Holt double-exponential smoothing (level + trend, α = β = 1/2) per
    * type over the hourly cents series — the next step up from
    * [[qEwmaHourly]]'s flat EWMA: the one-step-ahead forecast l + b
    * tracks a drifting series instead of lagging it. Exact-integer like
    * the EWMA, with one extra care: the TREND can be negative, and
    * Spark's `div` truncates toward zero while DuckDB's `//` floors —
    * so every halving is `shiftright(x, 1)` (arithmetic shift = floor
    * division by 2 on BOTH engines, the q_simhash sign-extension fact),
    * negative-safe bit-for-bit. Recursion:
    *   l₁ = x₁, b₁ = 0;
    *   lₜ = (xₜ + lₜ₋₁ + bₜ₋₁) >> 1
    *   bₜ = ((lₜ − lₜ₋₁) + bₜ₋₁) >> 1
    * (α = 1/2 of observation vs previous forecast; β = 1/2 of level
    * delta vs previous trend — the standard Holt update at power-of-two
    * gains.) Scale shape identical to the EWMA: one map-side-combining
    * hourly shuffle, then a row-local fold per type over its sorted
    * bounded series; the oracle replays the recursion as a recursive
    * CTE carrying (lev, tr). */
  def qHoltLinear(spark: SparkSession, dir: String): DataFrame =
    hourlyCents(spark, dir)
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("h"), col("cents"))))
        .as("series"))
      .select(col("event_type"), expr(
        """explode(zip_with(series,
          |  aggregate(series,
          |    CAST(array() AS ARRAY<STRUCT<lev: BIGINT, tr: BIGINT>>),
          |    (acc, e) -> acc || array(CASE WHEN size(acc) = 0
          |      THEN named_struct('lev', e.cents, 'tr', 0L)
          |      ELSE named_struct(
          |        'lev', shiftright(e.cents + element_at(acc, -1).lev
          |          + element_at(acc, -1).tr, 1),
          |        'tr', shiftright(shiftright(e.cents
          |            + element_at(acc, -1).lev + element_at(acc, -1).tr, 1)
          |          - element_at(acc, -1).lev + element_at(acc, -1).tr, 1))
          |      END)),
          |  (s, w) -> named_struct('h', s.h, 'cents', s.cents,
          |    'lev_c', w.lev, 'trend_c', w.tr,
          |    'forecast_c', w.lev + w.tr))) AS r""".stripMargin))
      .select(col("event_type"), col("r.h").as("h"),
        col("r.cents").as("cents"), col("r.lev_c").as("lev_c"),
        col("r.trend_c").as("trend_c"),
        col("r.forecast_c").as("forecast_c"))
      .orderBy("event_type", "h")

  /** Hours whose revenue sits more than 2σ from the type's mean, with
    * zero floating point: in whole currency units, x is anomalous iff
    * (n·x − S)² > 4·(n·Q − S²)  —  the 2σ test cleared of divisions and
    * square roots (multiply (x − S/n)² > 4·(nQ−S²)/n² through by n²).
    * Integer bounds: units ≲ 10⁶ even at sf10, so every product stays
    * far inside BIGINT; a larger deployment rescales units or widens to
    * DECIMAL before squaring. */
  def qAnomalyHours(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(Tables.dec(col("value"))), 0).cast("bigint")
        .as("units"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("units")).cast("bigint").as("s"),
        sum(col("units") * col("units")).cast("bigint").as("q"))
    hourly.join(broadcast(stats), "event_type")
      .filter((col("n") * col("units") - col("s")) *
        (col("n") * col("units") - col("s")) >
        lit(4L) * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_type"), col("h"), col("units"))
      .orderBy("event_type", "h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ewma_hourly" -> qEwmaHourly _,
    "q_holt_linear" -> qHoltLinear _,
    "q_anomaly_hours" -> qAnomalyHours _)

  val oracles: Map[String, String] = Map(
    "q_ewma_hourly" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY h) AS rn FROM hourly),
        |rec AS (
        |  SELECT event_type, h, rn, cents, cents AS ewma_c
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.h, s.rn, s.cents,
        |    (s.cents + r.ewma_c) // 2
        |  FROM seq s JOIN rec r
        |    ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT event_type, h, cents, CAST(ewma_c AS BIGINT) AS ewma_c
        |FROM rec ORDER BY event_type, h""".stripMargin,
    // Holt recursion replay carrying (lev, tr); >> is arithmetic on
    // both engines (negative trends floor identically) — see qHoltLinear
    "q_holt_linear" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY h) AS rn FROM hourly),
        |rec AS (
        |  SELECT event_type, h, rn, cents,
        |    cents AS lev, CAST(0 AS BIGINT) AS tr
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.h, s.rn, s.cents,
        |    (s.cents + r.lev + r.tr) >> 1,
        |    ((((s.cents + r.lev + r.tr) >> 1) - r.lev) + r.tr) >> 1
        |  FROM seq s JOIN rec r
        |    ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT event_type, h, cents, CAST(lev AS BIGINT) AS lev_c,
        |  CAST(tr AS BIGINT) AS trend_c,
        |  CAST(lev + tr AS BIGINT) AS forecast_c
        |FROM rec ORDER BY event_type, h""".stripMargin,
    "q_anomaly_hours" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 0) AS BIGINT) AS units
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, COUNT(*) AS n, CAST(SUM(units) AS BIGINT) AS s,
        |    CAST(SUM(units * units) AS BIGINT) AS q
        |  FROM hourly GROUP BY 1)
        |SELECT h.event_type, h.h, h.units
        |FROM hourly h JOIN stats t USING (event_type)
        |WHERE (t.n * h.units - t.s) * (t.n * h.units - t.s)
        |    > 4 * (t.n * t.q - t.s * t.s)
        |ORDER BY h.event_type, h.h""".stripMargin)
}
