package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixture-table loaders + shared numeric-parity helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against a
  * DuckDB run of `SparkEntry.oracleSql` (see /root/repo/BASELINE.md). Two
  * rules make that comparison deterministic:
  *
  *  1. Money/measure aggregates go through exact DECIMAL arithmetic
  *     ([[Tables.dec]]), then cast to DOUBLE at the very end. Summation of
  *     doubles is order-dependent across shuffle partitions; summation of
  *     decimals is exact, so both engines produce bit-identical doubles.
  *  2. Every query ends in a total-order `ORDER BY` (callers' duty).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Exact decimal view of a double measure column (2 fractional digits in
    * every fixture measure: prices, discounts, balances, quantities). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal SUM surfaced as a deterministic DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal sum, one IEEE double division. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
}
