package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

/** Streaming exact dedup: first-seen wins within the watermark horizon,
  * normalization collapses whitespace/case variants, distinct docs pass.
  */
class StreamingDedupSpec extends SparkSuite {

  import spark.implicits._

  private val T0 = 1700000000000L

  test("dropExactDuplicates keeps first occurrence, drops hash-equal repeats") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingDedup.dropExactDuplicates(docs, "doc_id", "text", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData(
        (t(1), 1L, "The quick brown fox"),
        (t(2), 2L, "the  QUICK   brown fox"), // normalizes to the same hash
        (t(3), 3L, "an entirely different doc"))
      query.processAllAvailable()
      // same content again inside the horizon → dropped
      stream.addData((t(4), 4L, "The quick brown fox"))
      query.processAllAvailable()
      // advance watermark far past the horizon, then flush with new data
      stream.addData((t(60), 5L, "late unique doc"))
      query.processAllAvailable()
      val ids = spark.sql("select doc_id from dedup_out").collect()
        .map(_.getLong(0)).toSet
      assert(ids.contains(1L) ^ ids.contains(2L)) // exactly one of the dup pair
      assert(ids.contains(3L))
      assert(!ids.contains(4L))
      assert(ids.contains(5L))
    } finally query.stop()
  }

  test("dropFingerprintDuplicates collapses reordered/case variants, keeps distinct docs") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingDedup
      .dropFingerprintDuplicates(docs, "doc_id", "text", "10 minutes")
      .writeStream.format("memory").queryName("fp_dedup_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData(
        (t(1), 1L, "the quick brown fox jumps"),
        // word reorder + casing + punctuation: same token vote sum ->
        // same fingerprint -> dropped as a near-dup
        (t(2), 2L, "Jumps, the QUICK brown fox!"),
        (t(3), 3L, "a completely unrelated document about spark"))
      query.processAllAvailable()
      val ids = spark.sql("select doc_id from fp_dedup_out").collect()
        .map(_.getLong(0)).toSet
      assert(ids.contains(1L) ^ ids.contains(2L)) // exactly one of the variants
      assert(ids.contains(3L))
    } finally query.stop()
  }
}
