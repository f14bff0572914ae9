package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Compliance erasure (GDPR/CCPA delete propagation): remove a set of
  * subjects from every table that references them, CASCADING through
  * foreign keys — customer → their orders → those orders' line items —
  * and emit the audit report a deletion job must produce (per-table
  * before/erased/after counts plus a key-sum witness of the surviving
  * rows, so "we deleted it" is checkable, not asserted).
  *
  * Scale shape: the deletion list is |subjects|-sized and broadcast;
  * every erase is then a broadcast ANTI join — one narrow pass per
  * table, no shuffle of any fact table. The one-hop cascade re-derives
  * the deleted-order key set the same way (broadcast semi join) before
  * the lineitem pass; if a deletion batch ever outgrew broadcast range
  * the in-repo bloom path ([[BloomJoin]]) is the same shape with a
  * constant-size filter. In production the report (not the data) is
  * what gets retained — the witness columns let a later audit re-verify
  * against the rewritten tables without trusting the job log. */
object Erasure {

  def qUserErasure(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    // the erasure request batch (deterministic stand-in for the real
    // right-to-be-forgotten queue)
    val del = cust.filter(col("c_custkey") % 37 === 5).select("c_custkey")
    val delOrd = ord.join(broadcast(del),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")

    // ONE pass per table: broadcast-mark the doomed rows, then derive
    // before/after/witness from a single conditional aggregate (an anti
    // join would need a second scan for the before-count)
    def report(name: String, table: DataFrame, joinKey: String,
        witnessKey: String, delKeys: DataFrame): DataFrame =
      table.join(broadcast(delKeys.withColumn("erased", lit(1))),
          col(joinKey) === col("dk"), "left")
        .agg(count(lit(1)).as("n_before"),
          count(col("erased")).as("n_erased"),
          count(when(col("erased").isNull, 1)).as("n_after"),
          sum(when(col("erased").isNull, col(witnessKey)))
            .cast("bigint").as("key_sum_after"))
        .select(lit(name).as("table_name"), col("n_before"),
          col("n_erased"), col("n_after"), col("key_sum_after"))

    val delK = del.withColumnRenamed("c_custkey", "dk")
    report("customer", cust, "c_custkey", "c_custkey", delK)
      .unionByName(report("orders", ord, "o_custkey", "o_orderkey", delK))
      .unionByName(report("lineitem", li, "l_orderkey", "l_orderkey",
        delOrd.withColumnRenamed("o_orderkey", "dk")))
      .orderBy("table_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_user_erasure" -> qUserErasure _)

  val oracles: Map[String, String] = Map(
    "q_user_erasure" ->
      """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 37 = 5),
        |delord AS (SELECT o_orderkey FROM orders
        |           WHERE o_custkey IN (SELECT c_custkey FROM del)),
        |c AS (SELECT 'customer' AS table_name,
        |        (SELECT COUNT(*) FROM customer) AS n_before,
        |        COUNT(*) AS n_after,
        |        CAST(SUM(c_custkey) AS BIGINT) AS key_sum_after
        |      FROM customer
        |      WHERE c_custkey NOT IN (SELECT c_custkey FROM del)),
        |o AS (SELECT 'orders' AS table_name,
        |        (SELECT COUNT(*) FROM orders) AS n_before,
        |        COUNT(*) AS n_after,
        |        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum_after
        |      FROM orders
        |      WHERE o_custkey NOT IN (SELECT c_custkey FROM del)),
        |l AS (SELECT 'lineitem' AS table_name,
        |        (SELECT COUNT(*) FROM lineitem) AS n_before,
        |        COUNT(*) AS n_after,
        |        CAST(SUM(l_orderkey) AS BIGINT) AS key_sum_after
        |      FROM lineitem
        |      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM delord))
        |SELECT table_name, n_before, n_before - n_after AS n_erased,
        |  n_after, key_sum_after
        |FROM (SELECT * FROM c UNION ALL SELECT * FROM o
        |      UNION ALL SELECT * FROM l)
        |ORDER BY table_name""".stripMargin)
}
