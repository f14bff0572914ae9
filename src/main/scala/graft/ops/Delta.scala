package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.dec

/** Incremental maintenance of a JOIN view — the delta-algebra step up
  * from [[Relational.qIncrementalAgg]]'s single-table partial merge.
  *
  * A warehouse keeps `V = Agg(A ⋈ B)` current as BOTH sides grow. The
  * naive refresh rejoins the full tables per ingest; the delta algebra
  * (differential-dataflow / DBSP view maintenance) rewrites the new
  * state as
  *
  *   (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
  *
  * so the refresh touches `A⋈B` only through yesterday's AGGREGATE
  * state (O(groups), not O(rows)) and pays join work proportional to
  * the deltas. The ΔA⋈ΔB cross term is the classic omission bug —
  * new-customer×new-order revenue silently vanishes without it — and
  * the full-recompute oracle makes exactly that mistake break the hash.
  *
  * Scale shape: the one big join (base⋈base) is yesterday's already-paid
  * cost, carried as mergeable partials (decimal sum + count — exact
  * under any merge order, the [[graft.ops.Skew]] argument). Every delta
  * term broadcasts its small delta side, so refresh adds NO shuffle of
  * either base table: ΔA⋈B and A⋈ΔB are one base-side scan each under a
  * broadcast hash join (at 100 TB the base sides would additionally be
  * key-bucketed, making them keyed lookups), ΔA⋈ΔB is broadcast⋈small.
  * Final merge is a groupBy over O(groups) partial rows.
  */
object Delta {

  /** Per-nation order count + revenue maintained incrementally across
    * two-sided deltas (new customers AND new orders in one refresh). */
  def qIncrementalJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    // deltas: the most recent ingests of each table (deterministic
    // key-derived splits so the cross term is provably non-empty)
    val isNewCust = col("c_custkey") % 7 === 3
    val isNewOrd = col("o_orderkey") % 5 === 4
    val cBase = cust.filter(!isNewCust); val cDelta = cust.filter(isNewCust)
    val oBase = ord.filter(!isNewOrd); val oDelta = ord.filter(isNewOrd)

    // mergeable partials of Agg(C ⋈ O) for one term of the decomposition
    def partials(c: DataFrame, o: DataFrame) =
      c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("pn"), sum(dec(col("o_totalprice"))).as("prev"))
    // yesterday's state: the base⋈base aggregate, already on storage
    val state = partials(cBase, oBase)
    // refresh: three delta terms, each broadcasting its delta side
    val refreshed = state
      .unionByName(partials(broadcast(cDelta), oBase))
      .unionByName(partials(cBase, broadcast(oDelta)))
      .unionByName(partials(broadcast(cDelta), oDelta))
      .groupBy("c_nationkey")
      .agg(sum(col("pn")).as("n_orders"), sum(col("prev")).as("rev"))
    refreshed
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_orders"),
        col("rev").cast("double").as("revenue"))
      .orderBy("n_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_incremental_join" -> qIncrementalJoin _)

  /** Oracle = the FULL recompute over base∪delta on both sides: hash
    * equality proves the four-term decomposition exact (drop the cross
    * term and new-customer×new-order rows vanish → mismatch). */
  val oracles: Map[String, String] = Map(
    "q_incremental_join" ->
      """SELECT n.n_name,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin)
}
