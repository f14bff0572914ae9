package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed co-located join: the pre-partitioning strategy for repeated
  * large-fact joins at scale — both sides bucketed+sorted on the join key
  * join with ZERO shuffle exchanges (the 100 TB pattern for a join that
  * would otherwise move the fact table every query). */
class BucketingSpec extends SparkSpec {

  test("bucketed join runs without any shuffle exchange and matches plain join") {
    // force a sort-merge join: the point is bucket co-location, which a
    // size-based broadcast of these tiny fixtures would mask
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    val dir = sf("sf0.001")
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))

    val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expected)

    // the join itself must be exchange-free (bucket co-location); the only
    // allowed exchange is the tiny post-join groupBy. Inspect the final
    // adaptive plan tree, not its string (which appends the initial plan).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // full traversal incl. AQE stage wrappers (collect() stops at them)
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case q: QueryStageExec => p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val nodes = allNodes(joined.queryExecution.executedPlan)
    val joins = nodes.collect { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, s"expected a sort-merge join:\n${nodes.head}")
    joins.foreach { j =>
      val shuffles = j.children.flatMap(allNodes)
        .collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty, s"join input was shuffled:\n$j")
    }
  }

  test("bucketedTable rebuilds when its backing dir was externally removed") {
    val dir = sf("sf0.001")
    // a (table, key) no other suite or prewarm uses, so clobbering its
    // layout can't race shared state
    val t1 = Bucketed.bucketedTable(spark, dir, "nation", "n_nationkey")
    val n = t1.count()
    assert(n > 0)
    val tname = spark.catalog.listTables().collect().map(_.name)
      .find(_.startsWith("b_nation_")).get
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $tname")
      .filter(col("col_name") === "Location").collect().head.getString(1)
    val root = new java.io.File(new java.net.URI(loc).getPath)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(root) // the long-session /tmp-cleaner scenario
    assert(!root.exists())
    // reuse must detect the lost location and drop+rebuild, not serve a
    // permanently broken catalog entry
    val t2 = Bucketed.bucketedTable(spark, dir, "nation", "n_nationkey")
    assert(t2.count() === n)
  }
}
