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

  final case class CustRow(c_custkey: Long, c_mktsegment: String)
  final case class OrderRow(o_custkey: Long, o_totalprice: Double)

  /** Typed cogroup: both relations grouped by the same key, the lambda
    * sees each key's TWO iterators at once — the typed face of a
    * full-outer join+aggregate, for per-key logic too entangled for
    * Column expressions (here: presence flags + an exact cents fold).
    * Scale shape is exactly a shuffle co-partition on the key (both
    * sides hash-partitioned, no materialized join product — the lambda
    * streams the per-key groups). Money is folded in integer CENTS via
    * BigDecimal.valueOf(...).setScale(2, HALF_UP), which is precisely
    * Spark's own double→DECIMAL(18,2) cast semantics (shortest-repr
    * string then half-up) — the same parity the dec() helpers rely on —
    * so the typed fold hash-matches the oracle's decimal SQL. */
  private[ops] def cogroupSpend(
      custs: org.apache.spark.sql.Dataset[CustRow],
      orders: org.apache.spark.sql.Dataset[OrderRow]): DataFrame = {
    import custs.sparkSession.implicits._
    custs.groupByKey(_.c_custkey)
      .cogroup(orders.groupByKey(_.o_custkey)) { (key, cs, os) =>
        val seg = cs.toSeq.headOption.map(_.c_mktsegment).getOrElse("?")
        var n = 0L
        var cents = 0L
        os.foreach { o =>
          n += 1
          cents += java.math.BigDecimal.valueOf(o.o_totalprice)
            .setScale(2, java.math.RoundingMode.HALF_UP)
            .unscaledValue().longValueExact()
        }
        Iterator((key, seg, n, cents))
      }
      .toDF("c_custkey", "segment", "n_orders", "spend_cents")
      .orderBy("c_custkey")
  }

  def qTypedCogroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cogroupSpend(
      Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")).as[CustRow],
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice")).as[OrderRow])
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_typed_stats" -> qTypedStats _,
      "q_typed_cogroup" -> qTypedCogroup _)

  val oracles: Map[String, String] = Map(
    "q_typed_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // full-outer cogroup semantics: a key missing on the customer side
    // would surface segment '?', missing orders surface n=0/cents=0 —
    // the COALESCEs mirror that exactly
    "q_typed_cogroup" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
        |  COALESCE(c.c_mktsegment, '?') AS segment,
        |  CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(o.cents, 0) AS BIGINT) AS spend_cents
        |FROM customer c FULL OUTER JOIN (
        |  SELECT o_custkey,
        |    COUNT(*) AS n,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY c_custkey""".stripMargin)
}
