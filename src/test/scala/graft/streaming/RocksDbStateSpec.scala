package graft.streaming

import graft.SparkSpec
import graft.streaming.EventsStream.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The 100 TB streaming-state configuration: the default
  * HDFSBackedStateStoreProvider keeps every key's state on the executor
  * HEAP (state size is bounded by executor memory — a non-starter for
  * high-cardinality keyed state at scale), while RocksDBStateStoreProvider
  * spills keyed state to local disk with incremental checkpointing.
  * Production deployments of the sessionization/funnel operators set
  *
  *   spark.sql.streaming.stateStore.providerClass =
  *     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  *
  * This spec proves the library's stateful operators are RocksDB-clean:
  * the same flatMapGroupsWithState sessionization run under RocksDB
  * (including an event-time timeout eviction, which exercises the
  * provider's remove path) emits exactly the sessions the default
  * provider emits. The provider is a per-query setting read at stream
  * start, so it's scoped here with try/finally and never leaks into the
  * shared session. */
class RocksDbStateSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ROCKS =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

  private def runSessionize(queryName: String): Seq[(Long, String, Long, Double)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.sessionizeWithState(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(queryName).start()
    input.addData(
      Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(ts("2024-01-01 10:10:00"), 1, "click", 2.0),
      Event(ts("2024-01-01 11:30:00"), 1, "click", 4.0),
      Event(ts("2024-01-01 10:05:00"), 2, "view", 8.0))
    q.processAllAvailable()
    // advance the watermark twice so open sessions hit their event-time
    // timeout (evaluated at the start of the batch AFTER the advance)
    input.addData(Event(ts("2024-01-02 00:00:00"), 99, "click", 0.0))
    q.processAllAvailable()
    input.addData(Event(ts("2024-01-02 00:01:00"), 99, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    spark.sql(
      s"SELECT user_id, cast(session_start AS STRING), n, total_value " +
        s"FROM $queryName ORDER BY user_id, 2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
  }

  test("flatMapGroupsWithState sessionization is identical under RocksDB state") {
    val expected = runSessionize("rocks_default_out")
    assert(expected.nonEmpty) // guard against a vacuous comparison
    val before = spark.conf.getOption(PROVIDER_KEY)
    spark.conf.set(PROVIDER_KEY, ROCKS)
    val got =
      try runSessionize("rocks_rocksdb_out")
      finally before match {
        case Some(v) => spark.conf.set(PROVIDER_KEY, v)
        case None => spark.conf.unset(PROVIDER_KEY)
      }
    assert(got === expected)
  }
}
