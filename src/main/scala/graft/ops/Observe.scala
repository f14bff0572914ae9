package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** `Dataset.observe` — pipeline instrumentation metrics that ride an
  * EXISTING pass instead of costing a second scan. A production ingest
  * job wants row counts, quality tallies, and control sums for every
  * batch it writes; recomputing them as a separate aggregation doubles
  * the corpus reads at 100 TB, while `observe` attaches an
  * AggregatingAccumulator to the already-running plan, collects partial
  * aggregates alongside the real work, and delivers the result to the
  * driver with the action's completion — zero extra jobs, zero extra
  * scans. (The accumulator path also makes it exactly-once per action,
  * unlike hand-rolled task-side counters, which double-count retried
  * tasks.)
  *
  * The gate query drives a filtered lineitem pass through the noop sink
  * with three observed metrics (count, decimal-exact control sum,
  * conditional tally), then surfaces the OBSERVED values as its result
  * row — the DuckDB oracle recomputes the same metrics from the table,
  * so a dropped partial, a double-counted retry, or a float drift in
  * the accumulator merge breaks the hash. */
object Observe {

  def qObserveMetrics(spark: SparkSession, dir: String): DataFrame = {
    val obs = Observation("graft_ingest_" + java.util.UUID.randomUUID())
    Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") < 30)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(Tables.dec(col("l_quantity"))).as("sum_qty"),
        count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
      .write.mode("overwrite").format("noop").save()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long],
      m("sum_qty").asInstanceOf[java.math.BigDecimal].doubleValue(),
      m("n_discounted").asInstanceOf[Long]))
      .toDF("n_rows", "sum_qty", "n_discounted")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_observe_metrics" -> qObserveMetrics _)

  val oracles: Map[String, String] = Map(
    "q_observe_metrics" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted
        |FROM lineitem WHERE l_quantity < 30""".stripMargin)
}
