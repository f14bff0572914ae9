package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the structure q_partition_prune's Scaladoc promises: the layout
  * really is hive-partitioned on lang, and the runtime-derived lang dim
  * plants a DynamicPruningSubquery on the fact scan (so only the
  * surviving languages' directories are read — the gate pins values,
  * this pins the pruning). */
class PartitionedSpec extends SparkSpec {

  test("partitioned layout: lang is a partition column, one dir per lang") {
    val dir = sf("sf0.001")
    Partitioned.partitionedDocs(spark, dir) // force the write
    // the layout dir is session-temp; find it through a fresh read's plan
    val plan = Partitioned.partitionedDocs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // lang must come back as a partition value, not a data column loss
    val langs = Partitioned.partitionedDocs(spark, dir)
      .select("lang").distinct().collect().map(_.getString(0)).sorted
    assert(langs === Array("de", "en", "es", "fr", "zh"))
  }

  test("q_partition_prune: dynamic pruning subquery on the fact scan") {
    val dir = sf("sf0.001")
    val plan = graft.SparkEntry.queries("q_partition_prune")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
  }

  test("q_partition_prune equals the same profile off the unpartitioned table") {
    val dir = sf("sf0.001")
    val got = graft.SparkEntry.queries("q_partition_prune")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val lc = graft.Tables(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val mean = lc.agg(avg("n")).collect()(0).getDouble(0)
    val hot = lc.filter(col("n") > mean).collect().map(_.getString(0)).toSet
    val expected = graft.Tables(spark, dir, "documents")
      .filter(col("lang").isInCollection(hot))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy("lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
    assert(hot === Set("en")) // the above-mean set the fixture implies
  }
}
