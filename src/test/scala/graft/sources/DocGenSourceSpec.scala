package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DocGenSourceSpec extends SparkSpec {

  private def read(n: Long, parts: Int = 4) =
    spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", n).option("numPartitions", parts).load()

  test("produces the requested rows with the declared schema") {
    val df = read(1000)
    assert(df.schema.fieldNames.toSeq === Seq("doc_id", "text", "lang"))
    assert(df.count() === 1000L)
    assert(df.select("doc_id").distinct().count() === 1000L)
  }

  test("content is deterministic across reads and partitions counts") {
    val a = read(200, parts = 2).orderBy("doc_id").collect().map(_.toSeq)
    val b = read(200, parts = 7).orderBy("doc_id").collect().map(_.toSeq)
    assert(a === b)
  }

  test("column pruning reaches the reader") {
    val df = read(100).select("lang")
    // the v2 scan's output must carry only the pruned column
    // (BatchScan docgen[lang#N] — v2 plans print the scan output inline)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.matches("(?s).*BatchScan docgen\\[lang#\\d+\\].*"), scan)
    assert(df.distinct().count() <= 5)
  }

  test("doc_id range pushdown prunes whole input partitions") {
    // unit level: 1000 docs / 4 partitions of 250; [750, 1000) keeps 1
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan, StringStartsWith}
    val sb = new DocGenScanBuilder(1000, 4, 42)
    val residual = sb.pushFilters(Array(
      GreaterThanOrEqual("doc_id", 750L),
      StringStartsWith("lang", "e"))) // not interpretable -> residual
    assert(residual.toSeq === Seq(StringStartsWith("lang", "e")))
    assert(sb.pushedFilters().toSeq === Seq(GreaterThanOrEqual("doc_id", 750L)))
    val parts = sb.build().toBatch.planInputPartitions()
    assert(parts.length === 1, parts.mkString(","))

    val sb2 = new DocGenScanBuilder(1000, 4, 42)
    sb2.pushFilters(Array(GreaterThanOrEqual("doc_id", 200L),
      LessThan("doc_id", 600L)))
    // clamps the two boundary partitions, keeps the middle one whole
    assert(sb2.build().toBatch.planInputPartitions().length === 3)
  }

  test("pushdown results equal the unpushed filter semantics") {
    val filtered = read(1000).filter(col("doc_id") >= 750 && col("doc_id") < 900)
    assert(filtered.count() === 150L)
    val a = filtered.orderBy("doc_id").collect().map(_.toSeq)
    val b = read(1000).orderBy("doc_id").collect().map(_.toSeq)
      .slice(750, 900)
    assert(a === b)
    // and the plan confirms the filters actually reached the scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters"), plan) // v2 scan line present
  }

  test("golden: the registered q_docgen_wordcount query is stable") {
    val rows = DocGenQueries.qDocgenWordcount(spark, "unused")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // generator content is a pure function of (seed, doc_id): these values
    // must never drift across Spark versions or partitioning changes
    assert(rows.length === 16)
    assert(rows.map(_._2).sum === 99908L)
    assert(rows.take(3).toSeq ===
      Seq(("batch", 6406L), ("filter", 6191L), ("group", 6230L)))
  }

  test("composes with the engine's operators (wordcount over the source)") {
    val counts = read(500)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count()
    assert(counts.count() > 0)
    val total = counts.agg(sum("count")).collect().head.getLong(0)
    // total words = sum of per-doc token counts
    val expected = read(500).select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(total === expected)
  }

  // string probe (AQE wraps the scan leaf): the pushed agg scan's
  // output columns (count_0, ...) appear in the plan text iff pushed
  private def scanSchema(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("aggregate pushdown: scan emits bounds arithmetic, results exact") {
    val df = read(1000).filter(col("doc_id") < 300)
      .agg(count(col("doc_id")).as("n"), min(col("doc_id")).as("mn"),
        max(col("doc_id")).as("mx"))
    val schema = scanSchema(df)
    assert(schema.contains("count_0"), s"aggregates not pushed: $schema")
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((300L, 0L, 299L)))
  }

  test("aggregate pushdown over an empty clamped range: count 0, not NULL") {
    // pushed doc_id filters that clamp away every partition used to plan
    // ZERO input partitions; with partial pushdown Spark then computed
    // the final COUNT as Sum over no partial rows = NULL. The marker
    // partition restores the empty-input semantics of the row scan.
    val df = read(1000).filter(col("doc_id") >= 5000)
      .agg(count(col("doc_id")).as("n"), min(col("doc_id")).as("mn"),
        max(col("doc_id")).as("mx"))
    val schema = scanSchema(df)
    assert(schema.contains("count_0"), s"aggregates not pushed: $schema")
    val r = df.head()
    assert(!r.isNullAt(0) && r.getLong(0) === 0L, s"count over empty: $r")
    assert(r.isNullAt(1) && r.isNullAt(2), s"min/max over empty: $r")
  }

  test("unsupported aggregate falls back to the row scan, still correct") {
    val df = read(1000).agg(avg(col("doc_id")).as("a"))
    val schema = scanSchema(df)
    assert(!schema.contains("count_0"), s"avg wrongly pushed: $schema")
    assert(df.head().getDouble(0) === 499.5)
  }
}
