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

  test("event funnel equals brute-force subsequence matching per user") {
    import org.apache.spark.sql.functions._
    val got = Temporal.qEventFunnel(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    val ev = graft.Tables(spark, sf("sf0.001"), "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "ts", "event_type").collect()
      .map { r =>
        val t = r.getTimestamp(1) // full µs precision: getTime alone is ms
        (r.getLong(0),
          t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000,
          r.getString(2))
      }
    val H = 24L * 3600 * 1000000
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      var stage = 0; var anchor = 0L
      es.sortBy(_._2).foreach { case (_, ts, t) =>
        if (stage == 0 && t == "view") { stage = 1; anchor = ts }
        else if (stage == 1 && t == "click" && ts <= anchor + H) stage = 2
        else if (stage == 2 && t == "purchase" && ts <= anchor + H) stage = 3
      }
      u -> stage
    }
    assert(got === expect)
    // the signal varies at this SF (not every user converts)
    assert(got.values.toSet.size > 1, s"degenerate stages: ${got.values.toSet}")
  }
}
