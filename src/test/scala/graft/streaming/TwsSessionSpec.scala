package graft.streaming

import graft.SparkSpec
import graft.streaming.EventsStream.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Migration-path witness: the transformWithState sessionization emits
  * exactly what the flatMapGroupsWithState one emits on the same input
  * stream — in-batch gap closes, cross-batch merges, and event-time
  * timer/timeout closes all line up. transformWithState requires the
  * RocksDB state store provider, so the conf is scoped per run. */
class TwsSessionSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val ROCKS =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

  private val batches: Seq[Seq[Event]] = Seq(
    Seq( // batch 1: user 1 in-batch gap close; user 2 stays open
      Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(ts("2024-01-01 10:10:00"), 1, "click", 2.0),
      Event(ts("2024-01-01 11:30:00"), 1, "click", 4.0),
      Event(ts("2024-01-01 10:05:00"), 2, "view", 8.0)),
    // batch 2: cross-batch merge for user 2 (within gap), then advance
    Seq(Event(ts("2024-01-01 10:20:00"), 2, "view", 1.0)),
    // batches 3+4: push the watermark so open sessions time out
    Seq(Event(ts("2024-01-02 00:00:00"), 99, "click", 0.0)),
    Seq(Event(ts("2024-01-02 00:01:00"), 99, "click", 0.0)))

  private def drive(
      mk: org.apache.spark.sql.Dataset[Event] =>
        org.apache.spark.sql.Dataset[EventsStream.SessionOut],
      name: String): Seq[(Long, String, Long, Double)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = mk(input.toDS()).writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.sql(s"SELECT user_id, cast(session_start AS STRING), n, " +
        s"total_value FROM $name ORDER BY user_id, 2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
  }

  test("transformWithState sessionization == flatMapGroupsWithState sessionization") {
    val expected = drive(EventsStream.sessionizeWithState, "tws_fmgws_out")
    assert(expected.nonEmpty)
    val before = spark.conf.getOption(PROVIDER_KEY)
    spark.conf.set(PROVIDER_KEY, ROCKS)
    val got =
      try drive(TwsSession.sessionize, "tws_new_out")
      finally before match {
        case Some(v) => spark.conf.set(PROVIDER_KEY, v)
        case None => spark.conf.unset(PROVIDER_KEY)
      }
    assert(got === expected)
    // the fixture shape this encodes: user 1's two sessions, user 2's
    // merged cross-batch session; user 99's stays open (not emitted)
    assert(got.map(_._1).toSet === Set(1L, 2L))
  }
}
