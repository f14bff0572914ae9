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
}
