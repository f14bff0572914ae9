package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{SparkSpec, Tables}
import TopKPerKey.topKPerKey

class TopKPerKeySpec extends SparkSpec {

  test("custom operator equals the window row_number plan exactly") {
    val orders = Tables(spark, sf("sf0.001"), "orders")
    val got = topKPerKey(orders,
        keys = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val expected = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("k=1 returns exactly the argmax row per key") {
    val orders = Tables(spark, sf("sf0.001"), "orders")
    val got = topKPerKey(orders, Seq(col("o_orderstatus")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1)
      .select("o_orderstatus", "o_totalprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = orders.groupBy("o_orderstatus")
      .agg(max("o_totalprice").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("physical plan uses TopKPerKeyExec with no sort below it") {
    val orders = Tables(spark, sf("sf0.001"), "orders")
    val df = topKPerKey(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"no sort should appear:\n$plan")
  }
}
