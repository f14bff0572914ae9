package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{SparkSpec, Tables}

class TemporalSpec extends SparkSpec {

  test("carry-forward as-of join equals the naive inequality-join formulation") {
    val dir = sf("sf0.001")
    // naive (non-scalable) reference implementation: inequality join +
    // pick the max-(ts, event_id) purchase per error
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isin("error", "purchase"))
      .select("event_id", "user_id", "ts", "event_type", "value")
    val dedupW = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(desc("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1).drop("rn")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val pickW = Window.partitionBy("event_id")
      .orderBy(desc("p_ts"), desc("p_event_id"))
    val naive = errors.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") <= col("ts"), "left")
      .withColumn("pick", row_number().over(pickW))
      .filter(col("pick") === 1)
      .select(col("event_id"), col("p_event_id"), col("p_value"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet

    val scalable = Temporal.qAsofJoin(spark, dir)
      .select("event_id", "p_event_id", "p_value")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet

    assert(scalable === naive)
    assert(naive.nonEmpty)
  }
}
