package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec

/** Slowly-changing-dimension (SCD type 2) merge — the CDC upsert shape
  * every incremental warehouse/pipeline needs and the reference (pure
  * batch-recompute) has no answer to: apply a change batch to a keyed
  * snapshot, CLOSING the current version of each changed key (valid_to =
  * batch date, is_current = false) and OPENING a new version, while
  * unchanged keys pass through untouched. History is append-only: no row
  * is ever updated in place, so the merge is expressible as pure joins +
  * union — exactly what an object-store table format (or plain
  * partitioned parquet) can serve.
  *
  * Scale shape: ONE shuffle of the snapshot on the merge key serves both
  * branches (the left join that closes/passes rows and the inner join
  * that opens new versions ride the same exchange — Spark reuses it), and
  * the change batch is the small side: at 100 TB-of-history /
  * GB-of-batch the batch broadcasts and the snapshot never shuffles at
  * all, it is scanned once per branch with the join key pruned to the
  * batch's bloom (compose with [[BloomJoin]]). Cost is |snapshot| +
  * |batch|, never |history|² — the same incremental discipline as
  * q_dedup_incremental.
  */
object Scd {

  private val BatchDate = "2001-06-01"

  /** SCD2 merge of a per-customer spend batch (orders on/after
    * [[BatchDate]]) into the customer balance snapshot. Deterministic and
    * fully oracle-gated: the DuckDB twin replays the same two joins. */
  def qScdUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "customer")
      .select(col("c_custkey"), dec(col("c_acctbal")).as("bal0"))
    val changes = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(BatchDate).cast("timestamp"))
      .groupBy("o_custkey")
      .agg(sum(dec(col("o_totalprice"))).as("spend"))
    val joined = base.join(changes,
      col("c_custkey") === col("o_custkey"), "left")
    // branch 1: prior versions — closed when the batch touches the key,
    // passed through (still current) when it doesn't
    val prior = joined.select(
      col("c_custkey"), col("bal0").cast("double").as("bal"),
      lit("1995-01-01").as("valid_from"),
      when(col("spend").isNotNull, lit(BatchDate)).as("valid_to"),
      col("spend").isNull.as("is_current"))
    // branch 2: the newly-opened versions for changed keys
    val opened = joined.filter(col("spend").isNotNull).select(
      col("c_custkey"), (col("bal0") + col("spend")).cast("double").as("bal"),
      lit(BatchDate).as("valid_from"),
      lit(null).cast("string").as("valid_to"),
      lit(true).as("is_current"))
    prior.unionAll(opened).orderBy("c_custkey", "valid_from")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd_upsert" -> qScdUpsert _)

  val oracles: Map[String, String] = Map(
    "q_scd_upsert" ->
      s"""WITH base AS (
         |  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal0
         |  FROM customer),
         |ch AS (
         |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '$BatchDate'
         |  GROUP BY o_custkey)
         |SELECT c_custkey, CAST(bal0 AS DOUBLE) AS bal,
         |  '1995-01-01' AS valid_from,
         |  CASE WHEN spend IS NOT NULL THEN '$BatchDate' END AS valid_to,
         |  spend IS NULL AS is_current
         |FROM base LEFT JOIN ch ON c_custkey = o_custkey
         |UNION ALL
         |SELECT c_custkey, CAST(bal0 + spend AS DOUBLE) AS bal,
         |  '$BatchDate' AS valid_from, NULL AS valid_to, TRUE AS is_current
         |FROM base JOIN ch ON c_custkey = o_custkey
         |ORDER BY c_custkey, valid_from""".stripMargin)
}
