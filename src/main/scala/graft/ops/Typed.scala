package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset API surface: case-class `Encoder`s, `groupByKey`, and a
  * custom [[Aggregator]] — the compile-time-typed face of the same
  * engine (every other operator here is DataFrame/Column-based, which
  * is the hot path: typed lambdas run opaque to Catalyst, so this
  * surface is for correctness-critical business logic where field-level
  * type safety pays for the serialization boundary, not for 100 TB
  * scans; the scaladoc trade-off IS the point of the demo).
  *
  * The aggregation itself is still algebraic (zero/reduce/merge), so it
  * runs as a proper partial → merge pass — typed does not mean
  * driver-side.
  */
object Typed {

  /** documents row (field names/types mirror the parquet schema). */
  final case class DocRow(
      doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)

  /** Per-group stats buffer — algebraic: merge(x, y) is associative and
    * commutative, so partial aggregation works under any partitioning. */
  final case class LangStats(
      n_docs: Long, total_chars: Long, max_chars: Long)

  object LangStatsAgg extends Aggregator[DocRow, LangStats, LangStats] {
    override def zero: LangStats = LangStats(0L, 0L, Long.MinValue)
    override def reduce(b: LangStats, a: DocRow): LangStats =
      LangStats(b.n_docs + 1, b.total_chars + a.n_chars,
        math.max(b.max_chars, a.n_chars))
    override def merge(x: LangStats, y: LangStats): LangStats =
      LangStats(x.n_docs + y.n_docs, x.total_chars + y.total_chars,
        math.max(x.max_chars, y.max_chars))
    override def finish(r: LangStats): LangStats = r
    override def bufferEncoder: Encoder[LangStats] = Encoders.product
    override def outputEncoder: Encoder[LangStats] = Encoders.product
  }

  /** Per-language stats through the typed pipeline; result flattened
    * back to columns so the driver gate hash-compares it like any
    * DataFrame query. */
  def qTypedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").as[DocRow]
      .groupByKey(_.lang)
      .agg(LangStatsAgg.toColumn.name("s"))
      .select(col("key").as("lang"),
        col("s.n_docs").as("n_docs"),
        col("s.total_chars").as("total_chars"),
        col("s.max_chars").as("max_chars"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_typed_stats" -> qTypedStats _)

  val oracles: Map[String, String] = Map(
    "q_typed_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
}
