package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal join operators over `events`: as-of join and range join —
  * the join flavors SURVEY.md §2.4 lists as absent in the reference.
  *
  * Scale design:
  *  - as-of join: NOT a per-row inequality join (which explodes on skewed
  *    keys); instead the classic scalable composition — union both
  *    streams, sort within the key partition, carry the last match
  *    forward with an ignoreNulls last() running window. One shuffle on
  *    the key, O(n log n) per key, no candidate blowup.
  *  - range join: the small side (static bands) broadcasts; the fact side
  *    never shuffles.
  */
object Temporal {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Forward as-of join: for each `error`, the NEXT `purchase` of the
    * same user at-or-after it — the mirror of [[qAsofJoin]] (same
    * union + single-struct-carry plan, frame reversed to
    * currentRow→unboundedFollowing), the "time-to-recovery /
    * next-action" direction of event attribution. Identical scale
    * shape: one window shuffle on user_id, no join of the raw streams. */
  def qAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isin("error", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
    val dedupW = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(desc("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1).drop("rn")
    val errors = ev.filter(col("event_type") === "error")
    val unioned = errors.select(col("event_id"), col("user_id"), col("ts"),
        lit(0).as("is_p"), lit(null).cast("double").as("value"))
      .unionByName(purchases.select(col("event_id"), col("user_id"),
        col("ts"), lit(1).as("is_p"), col("value")))
    // errors FIRST at equal ts so the same-ts purchase is in the frame
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts"), asc("is_p"), asc("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("p_match",
        first(when(col("is_p") === 1,
            struct(col("ts"), col("event_id"), col("value"))),
          ignoreNulls = true).over(w))
      .filter(col("is_p") === 0)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), TsFmt).as("ets"),
        col("p_match.event_id").as("p_event_id"),
        date_format(col("p_match.ts"), TsFmt).as("pts"),
        col("p_match.value").as("p_value"))
      .orderBy("event_id")
  }

  /** As-of join: for each `error` event, the most recent `purchase` of
    * the same user at-or-before it (ties on ts resolved purchase-first,
    * then by highest purchase event_id — purchases are deduped to one per
    * (user, ts) so the DuckDB ASOF oracle is deterministic too). */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isin("error", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
    // dedupe purchases to one per (user, ts): keep max event_id
    val dedupW = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(desc("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1).drop("rn")
    val errors = ev.filter(col("event_type") === "error")
    val unioned = errors.select(col("event_id"), col("user_id"), col("ts"),
        lit(0).as("is_p"), lit(null).cast("double").as("value"))
      .unionByName(purchases.select(col("event_id"), col("user_id"),
        col("ts"), lit(1).as("is_p"), col("value")))
    // purchase-first at equal ts so it is visible to the error row
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts"), desc("is_p"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last() carrying the whole matched purchase row as a struct: all
    // p_* columns come from the same row even if value were NULL (three
    // independent ignoreNulls last() calls could mix rows in that case).
    unioned
      .withColumn("p_match",
        last(when(col("is_p") === 1,
            struct(col("ts"), col("event_id"), col("value"))),
          ignoreNulls = true).over(w))
      .filter(col("is_p") === 0)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), TsFmt).as("ets"),
        col("p_match.event_id").as("p_event_id"),
        date_format(col("p_match.ts"), TsFmt).as("pts"),
        col("p_match.value").as("p_value"))
      .orderBy("event_id")
  }

  /** Range join: classify purchase values into static bands (broadcast
    * small side; BETWEEN condition), then count per band. */
  def qRangeBand(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.createDataFrame(Seq(
      ("p00_small", 0.0, 50.0),
      ("p01_mid", 50.0, 120.0),
      ("p02_large", 120.0, 250.0),
      ("p03_huge", 250.0, 1e9))).toDF("band", "lo", "hi")
    Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        graft.Tables.dsum(col("value")).as("total"))
      .orderBy("band")
  }

  /** Batch sessionization: per-user activity sessions closed by a
    * 30-minute gap, via Spark's session_window — the batch twin of
    * [[graft.streaming.EventsStream.sessionAgg]]. The oracle expresses
    * the identical semantics as gaps-and-islands SQL (new-session flag on
    * gap > 30min, running sum as session id). */
  def qSessionize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), graft.Tables.dsum(col("value")).as("total"))
      .select(col("user_id"),
        date_format(col("session_window.start"), TsFmt).as("session_start"),
        col("n"), col("total"))
      .orderBy("user_id", "session_start")

  /** Batch companion of [[graft.streaming.EventsStream.dedupStream]]:
    * exact dedup of events on (user_id, event_type, value), keeping the
    * first occurrence in EVENT TIME (min ts, then min event_id). Note the
    * semantics deliberately differ from the streaming op where arrival
    * order ≠ event order: the stream keeps the first-ARRIVED row and may
    * re-emit a key after its watermark state is evicted (asserted in
    * EventsStreamSpec); the batch query is the deterministic global
    * answer — each key exactly once, earliest event wins. */
  def qEventsDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type", "value")
      .orderBy(asc("ts"), asc("event_id"))
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"),
        date_format(col("ts"), TsFmt).as("first_ts"),
        col("event_id").as("first_event_id"))
      .orderBy(asc_nulls_first("user_id"), asc_nulls_first("event_type"),
        asc_nulls_first("value"))
  }

  /** Interval-overlap self-join: pairs of a customer's own orders whose
    * 30-day fulfillment windows overlap. The equi-key (custkey) carries
    * the shuffle; the interval condition only filters within the key
    * group — the scalable shape for interval joins (never a blind
    * inequality-only join). */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("w_start"))
      .withColumn("w_end", date_add(col("w_start"), 30))
    o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey") &&
          col("a.w_start") < col("b.w_end") &&
          col("b.w_start") < col("a.w_end"))
      .select(col("a.o_custkey").as("custkey"),
        col("a.o_orderkey").as("k1"), col("b.o_orderkey").as("k2"),
        datediff(least(col("a.w_end"), col("b.w_end")),
          greatest(col("a.w_start"), col("b.w_start"))).as("overlap_days"))
      .orderBy("custkey", "k1", "k2")
  }

  /** Purchase→error funnel join: every (purchase, same-user error within
    * the 30 minutes after) pair — the batch twin of
    * [[graft.streaming.EventsStream.purchaseErrorJoin]], pinning the
    * stream-stream join's semantics behind the SQL oracle. The equi-key
    * (user_id) carries the shuffle; the time band only filters within the
    * key group — same scalable shape as [[qIntervalJoin]]. */
  def qStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
    p.join(e, col("user_id") === col("e_user") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("p_id"), col("e_id"), col("user_id"),
        date_format(col("p_ts"), TsFmt).as("pts"),
        date_format(col("e_ts"), TsFmt).as("ets"),
        col("value"))
      .orderBy("p_id", "e_id")
  }

  /** First-touch conversion funnel per user: the furthest prefix of
    * view → click → purchase reached as an ordered subsequence ANCHORED at
    * the user's FIRST view, with the whole funnel inside a 24-hour
    * attribution window of that anchor (the standard first-touch
    * attribution semantic; without a window the fixture's users all
    * trivially convert). The greedy fold from the fixed anchor equals the
    * oracle's min-timestamp cascade by construction (first view, then MIN
    * qualifying click, then MIN qualifying purchase); the fixture has no
    * (user, ts) ties at any SF, so µs truncation preserves strict order.
    * One shuffle on user_id, then a row-local fold over the sorted event
    * list — per-user event counts are session-scale, never corpus-scale,
    * so the collected list is bounded; the min-cascade alternative costs
    * three corpus joins. */
  def qEventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(spark, dir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
    ev.groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sort_array(collect_list(struct(col("ts"), col("event_type"))))
          .as("evs"))
      .select(col("user_id"), col("n_view"), col("n_click"),
        col("n_purchase"), expr(
          """aggregate(evs, struct(0 AS s, CAST(NULL AS TIMESTAMP) AS a),
            |  (st, e) -> CASE
            |    WHEN st.s = 0 AND e.event_type = 'view'
            |      THEN struct(1 AS s, e.ts AS a)
            |    WHEN st.s = 1 AND e.event_type = 'click'
            |        AND e.ts <= st.a + INTERVAL 24 HOURS
            |      THEN struct(2 AS s, st.a AS a)
            |    WHEN st.s = 2 AND e.event_type = 'purchase'
            |        AND e.ts <= st.a + INTERVAL 24 HOURS
            |      THEN struct(3 AS s, st.a AS a)
            |    ELSE st END,
            |  st -> st.s)""".stripMargin).as("funnel_stage"))
      .orderBy("user_id")
  }

  /** Weekly retention: for each ISO week, the distinct active users and
    * how many are also active the FOLLOWING week (the product-analytics
    * cohort staple). Shuffle shape: one distinct on (week, user) — the
    * natural corpus-size reduction — then a self-equi-join on
    * (user, week+7d) that only ever moves the distinct'd activity table,
    * never raw events; the final per-week rollup is tiny. The last week
    * honestly reports 0 retained (no following week exists). */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val act = graft.Tables(spark, dir, "events")
      .select(date_trunc("week", col("ts")).as("week"), col("user_id"))
      .distinct()
    val retained = act.as("a")
      .join(act.as("b"),
        col("b.user_id") === col("a.user_id") &&
          col("b.week") === col("a.week") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("a.week").as("week"))
      .agg(count(lit(1)).as("n_retained"))
    act.groupBy("week").agg(count(lit(1)).as("n_active"))
      .join(retained, Seq("week"), "left")
      .select(date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        (coalesce(col("n_retained"), lit(0L)).cast("double") / col("n_active"))
          .as("retention_rate"))
      .orderBy("week")
  }

  /** Time-series densification: per-type hourly grid with zero-filled
    * gaps — the resample step every downstream window/anomaly model
    * assumes (a missing hour must be an explicit zero row, not an absent
    * one). The grid is GENERATED row-locally (`sequence` + `explode`
    * from each type's min/max hour — one tiny row per type expands to
    * its own grid, no driver loop, no cross join), then the observed
    * per-hour aggregate left-joins onto it. At 100 TB the aggregate side
    * is the only fact-sized input; the grid is |types| × |hours| and
    * partitions with the join key. */
  def qResampleHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("value"))
    val counts = ev.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n_events"),
        graft.Tables.dsum(col("value")).as("total_value"))
    val grid = ev.groupBy("event_type")
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
          .as("h"))
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("event_type", "h")
  }

  /** First-order Markov transition matrix over per-user event
    * sequences (the behavioral-modeling staple next to the funnel:
    * P(next event | current event) estimated from observed bigrams).
    * Each user's stream is ordered by (ts, event_id) — the event_id
    * tiebreak makes the sequence a TOTAL order, so lag() is
    * deterministic under any partitioning even when a user logs two
    * events in the same microsecond. Row probabilities are reported as
    * exact integer basis points (n·10000 div row_total). Shuffle
    * shape: ONE window partitioned by user_id (per-user sequences are
    * bounded; a pathological mega-user is capped upstream — the
    * q_source_cap argument), then a hash agg on the ≤|types|² pair
    * key with map-side combine; the row-total window runs over the
    * tiny pair matrix, not events. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    val counts = trans
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wrow = Window.partitionBy(col("from_type"))
    counts.withColumn("row_total", sum(col("n")).over(wrow))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 10000L div row_total").cast("bigint").as("p_bp"))
      .orderBy("from_type", "to_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_transitions" -> qEventTransitions _,
    "q_resample_hourly" -> qResampleHourly _,
    "q_retention" -> qRetention _,
    "q_event_funnel" -> qEventFunnel _,
    "q_stream_join" -> qStreamJoin _,
    "q_events_dedup" -> qEventsDedup _,
    "q_interval_join" -> qIntervalJoin _,
    "q_sessionize" -> qSessionize _,
    "q_asof_join" -> qAsofJoin _,
    "q_asof_forward" -> qAsofForward _,
    "q_range_band" -> qRangeBand _)

  val oracles: Map[String, String] = Map(
    // per-user lag over the (ts, event_id) total order, pair counts,
    // integer basis-point row probabilities — see qEventTransitions
    "q_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |c AS (SELECT from_type, event_type AS to_type,
        |        CAST(COUNT(*) AS BIGINT) AS n
        |      FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type)
        |    AS BIGINT) AS p_bp
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q_resample_hourly" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, value FROM events),
        |counts AS (
        |  SELECT event_type, h, COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |    UNNEST(generate_series(MIN(h), MAX(h), INTERVAL 1 HOUR)) AS h
        |  FROM ev GROUP BY event_type)
        |SELECT g.event_type, g.h,
        |  CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
        |  COALESCE(c.total_value, 0.0) AS total_value
        |FROM grid g LEFT JOIN counts c
        |  ON g.event_type = c.event_type AND g.h = c.h
        |ORDER BY g.event_type, g.h""".stripMargin,
    "q_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT date_trunc('week', ts) AS week, user_id FROM events),
        |ret AS (
        |  SELECT a.week, COUNT(*) n_retained FROM act a
        |  JOIN act b ON b.user_id = a.user_id
        |    AND b.week = a.week + INTERVAL 7 DAY
        |  GROUP BY 1),
        |tot AS (SELECT week, COUNT(*) n_active FROM act GROUP BY 1)
        |SELECT strftime(tot.week, '%Y-%m-%d') AS week,
        |  CAST(n_active AS BIGINT) AS n_active,
        |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
        |  CAST(COALESCE(n_retained, 0) AS DOUBLE) / n_active AS retention_rate
        |FROM tot LEFT JOIN ret ON tot.week = ret.week
        |ORDER BY week""".stripMargin,
    "q_event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (SELECT user_id, MIN(ts) ts1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) ts2 FROM e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.ts1
        |    AND e.ts <= t1.ts1 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts) ts3 FROM e
        |  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.ts2
        |  JOIN t1 ON e.user_id = t1.user_id
        |    AND e.ts <= t1.ts1 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |u AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |  FROM e GROUP BY 1)
        |SELECT u.user_id AS user_id, u.n_view, u.n_click, u.n_purchase,
        |  CAST(CASE WHEN t3.ts3 IS NOT NULL THEN 3
        |            WHEN t2.ts2 IS NOT NULL THEN 2
        |            WHEN t1.ts1 IS NOT NULL THEN 1
        |            ELSE 0 END AS INT) AS funnel_stage
        |FROM u
        |LEFT JOIN t1 ON u.user_id = t1.user_id
        |LEFT JOIN t2 ON u.user_id = t2.user_id
        |LEFT JOIN t3 ON u.user_id = t3.user_id
        |ORDER BY u.user_id""".stripMargin,
    "q_stream_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, ts AS p_ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT event_id AS e_id, user_id, ts AS e_ts FROM events
        |  WHERE event_type = 'error')
        |SELECT p_id, e_id, p.user_id AS user_id,
        |  strftime(p_ts, '%Y-%m-%d %H:%M:%S.%f') AS pts,
        |  strftime(e_ts, '%Y-%m-%d %H:%M:%S.%f') AS ets,
        |  value
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND e_ts >= p_ts AND e_ts <= p_ts + INTERVAL '30 minutes'
        |ORDER BY p_id, e_id""".stripMargin,
    "q_events_dedup" ->
      """SELECT user_id, event_type, value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  event_id AS first_event_id
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type, value
        |    ORDER BY ts, event_id) rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST,
        |  value ASC NULLS FIRST""".stripMargin,
    "q_interval_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS w_start,
        |    CAST(o_orderdate AS DATE) + 30 AS w_end
        |  FROM orders)
        |SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
        |  CAST(date_diff('day',
        |    GREATEST(a.w_start, b.w_start), LEAST(a.w_end, b.w_end)) AS INT)
        |    AS overlap_days
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        | AND a.w_start < b.w_end AND b.w_start < a.w_end
        |ORDER BY custkey, k1, k2""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    -- >= : Spark session windows are [start, last+gap), so a gap
        |    -- of exactly the duration starts a NEW session
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL '30 minutes'
        |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |ids AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM ids GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type, value FROM events
        |  WHERE event_type IN ('error', 'purchase')),
        |purchases AS (
        |  SELECT * FROM (
        |    SELECT event_id, user_id, ts, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) rn
        |    FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
        |errors AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ets,
        |  p.event_id AS p_event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS pts,
        |  p.value AS p_value
        |FROM errors e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND p.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_asof_forward" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type, value FROM events
        |  WHERE event_type IN ('error', 'purchase')),
        |purchases AS (
        |  SELECT * FROM (
        |    SELECT event_id, user_id, ts, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) rn
        |    FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
        |errors AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ets,
        |  p.event_id AS p_event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS pts,
        |  p.value AS p_value
        |FROM errors e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_range_band" ->
      """SELECT band, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |JOIN (VALUES ('p00_small', 0.0, 50.0), ('p01_mid', 50.0, 120.0),
        |             ('p02_large', 120.0, 250.0), ('p03_huge', 250.0, 1e9))
        |  b(band, lo, hi)
        |  ON value >= lo AND value < hi
        |WHERE event_type = 'purchase'
        |GROUP BY band ORDER BY band""".stripMargin)
}
