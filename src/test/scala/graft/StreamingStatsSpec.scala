package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingStats
import graft.streaming.StreamingStats._

/** Watermarked windowed aggregation + flatMapGroupsWithState
  * sessionization over MemoryStream micro-batches.
  */
class StreamingStatsSpec extends SparkSuite {

  import spark.implicits._

  private val T0 = 1700000000000L // epoch ms

  test("windowed counts with watermark: correct per-window totals; late event dropped") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val events = stream.toDF().toDF("ts", "event_type", "value")
    val query = StreamingStats.windowedCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData((t(1), "view", 1.0), (t(2), "view", 2.0), (t(3), "click", 4.0))
      query.processAllAvailable()
      // advance event time far past the first window + watermark → closes it
      stream.addData((t(40), "view", 8.0))
      query.processAllAvailable()
      // a very late event for the first window: beyond watermark → dropped
      stream.addData((t(2), "view", 100.0))
      query.processAllAvailable()
      stream.addData((t(80), "view", 16.0))
      query.processAllAvailable()
      val rows = spark.sql("select * from win_counts").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // windows align to epoch multiples of the window length
      val w0 = T0 - (T0 % 600000)
      // first window emitted with the ON-TIME totals only
      assert(rows.contains((w0, "view", 2L, 3.0)))
      assert(rows.contains((w0, "click", 1L, 4.0)))
      assert(!rows.exists { case (w, t2, _, v) => w == w0 && t2 == "view" && v > 3.0 })
    } finally query.stop()
  }

  test("sessionize: gap closes a session and starts the next") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val sessions = StreamingStats.sessionize(stream.toDS(), gapMs = 60000)
    val query = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 30s apart (one session), then 10min later two more
      stream.addData(
        SessionEvent(1L, T0, "a"), SessionEvent(1L, T0 + 30000, "b"),
        SessionEvent(2L, T0, "x"))
      query.processAllAvailable()
      stream.addData(
        SessionEvent(1L, T0 + 630000, "c"), SessionEvent(1L, T0 + 650000, "d"))
      query.processAllAvailable()
      val rows = spark.sql("select * from sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // user 1's first session closed by the gap when event 3 arrived
      assert(rows.contains((1L, T0, T0 + 30000, 2L)))
    } finally query.stop()
  }
}
