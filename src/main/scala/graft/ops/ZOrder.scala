package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) clustering — the multi-dimensional data-skipping
  * layout for 100 TB scans: interleaving the bits of two (or more)
  * quantized sort keys gives every contiguous file/partition of the
  * sorted table a TIGHT min/max range in EVERY interleaved dimension, so
  * footer-level range pruning works for predicates on either column. A
  * plain 1-D sort buys tight ranges in its own column and full-width
  * ranges in every other; z-order trades a little of the first for
  * bounded ranges in all of them (each halving of the file count halves
  * the range of each dimension in turn). This is the clustering layout
  * Delta/Iceberg expose as `OPTIMIZE ZORDER BY` — here built from plain
  * codegen'd integer expressions (quantize → bit-spread → interleave),
  * no table format required.
  *
  * Everything is INTEGER math (scalar-subquery denominators, integer
  * div, shifts, masks) so the DuckDB oracle replays it exactly: the
  * gate re-derives the morton codes, bucket ids, and per-bucket
  * min/max/count from scratch. The bucket id is the morton code's top 4
  * bits — the 16-file layout a writer would fan out to — NOT an ntile
  * (row-count ties would make file assignment nondeterministic).
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (classic magic
    * masks). Input must be in [0, 65535]. */
  private[graft] def spread16(x: Column): Column = {
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit morton code of two 16-bit quantized values (y gets the odd
    * bits — the MSB — matching the oracle). */
  private[graft] def morton2(x16: Column, y16: Column): Column =
    shiftleft(spread16(y16), 1).bitwiseOR(spread16(x16))

  /** Per-z-bucket layout report over lineitem clustered on
    * (l_orderkey, l_partkey): row count and both dimensions' min/max per
    * bucket. The min/max columns ARE the skipping index a reader would
    * consult — the spec asserts they are ~4× tighter per dimension than
    * the global range (top-4 morton bits fix 2 high bits of EACH dim),
    * where a 1-D sort leaves the second dimension full-width. */
  def qZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
    // scalar denominators for the 16-bit quantization, kept IN-PLAN as a
    // broadcast 1-row aggregate (the standard scalar-subquery shape) —
    // integer div so the oracle replays it bit-exactly
    val denoms = li.agg((max(col("l_orderkey")) + 1).as("okden"),
      (max(col("l_partkey")) + 1).as("pkden"))
    val z = li.crossJoin(broadcast(denoms))
      .withColumn("x16", expr("(l_orderkey * 65536) div okden"))
      .withColumn("y16", expr("(l_partkey * 65536) div pkden"))
      .withColumn("bucket",
        shiftright(morton2(col("x16"), col("y16")), 28)
          .bitwiseAND(lit(15L)).cast("int"))
    z.groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("l_orderkey")).as("ok_min"), max(col("l_orderkey")).as("ok_max"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_layout" -> qZorderLayout _)

  val oracles: Map[String, String] = Map(
    // same quantize -> spread -> interleave pipeline in SQL; DuckDB's >>
    // is arithmetic like Spark's shiftright (operands here are positive,
    // and the & 15 masks anyway)
    "q_zorder_layout" ->
      """WITH d AS (
        |  SELECT MAX(l_orderkey) + 1 AS okden, MAX(l_partkey) + 1 AS pkden
        |  FROM lineitem),
        |q AS (
        |  SELECT (l_orderkey * 65536) // okden AS x16,
        |         (l_partkey * 65536) // pkden AS y16,
        |         l_orderkey, l_partkey
        |  FROM lineitem CROSS JOIN d),
        |sx AS (
        |  SELECT *, ((x16 | (x16 << 8)) & 16711935) AS xa,
        |            ((y16 | (y16 << 8)) & 16711935) AS ya FROM q),
        |s2 AS (
        |  SELECT *, ((xa | (xa << 4)) & 252645135) AS xb,
        |            ((ya | (ya << 4)) & 252645135) AS yb FROM sx),
        |s3 AS (
        |  SELECT *, ((xb | (xb << 2)) & 858993459) AS xc,
        |            ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
        |s4 AS (
        |  SELECT *, ((xc | (xc << 1)) & 1431655765) AS xs,
        |            ((yc | (yc << 1)) & 1431655765) AS ys FROM s3),
        |m AS (
        |  SELECT l_orderkey, l_partkey,
        |    CAST(((((ys << 1) | xs) >> 28) & 15) AS INT) AS bucket
        |  FROM s4)
        |SELECT bucket, COUNT(*) AS n,
        |  MIN(l_orderkey) AS ok_min, MAX(l_orderkey) AS ok_max,
        |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max
        |FROM m GROUP BY bucket ORDER BY bucket""".stripMargin)
}
