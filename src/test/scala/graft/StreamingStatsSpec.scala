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

  test("sessionizeEventTime: watermark flushes the idle user's session via timeout") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val events = stream.toDF().toDF("ts", "user_id", "event_type")
      .select(col("user_id"), col("ts"), col("event_type"))
    val sessions = StreamingStats.sessionizeEventTime(events,
      gapMs = 60000, watermark = "1 minute")
    val query = sessions.writeStream.format("memory").queryName("et_sessions")
      .outputMode("append").start()
    try {
      def t(ms: Long) = new Timestamp(T0 + ms)
      // user 1 goes idle after two events; user 2 keeps the stream alive
      stream.addData((t(0), 1L, "a"), (t(30000), 1L, "b"), (t(0), 2L, "x"))
      query.processAllAvailable()
      // advance event time via user 2 only: watermark moves past user
      // 1's last + gap, so the EventTimeTimeout must flush user 1's
      // session WITHOUT any further user-1 event
      stream.addData((t(600000), 2L, "y"))
      query.processAllAvailable()
      stream.addData((t(1200000), 2L, "z"))
      query.processAllAvailable()
      val rows = spark.sql("select * from et_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.contains((1L, T0, T0 + 30000, 2L)), rows.toString)
    } finally query.stop()
  }

  test("windowedCorpusReport: closed window carries scale + dup counters") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val docs = stream.toDF().toDF("ts", "text")
    val rep = StreamingStats.windowedCorpusReport(docs,
      windowLen = "10 minutes", watermark = "1 minute")
    val query = rep.writeStream.format("memory").queryName("report_win")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData(
        (t(1), "alpha beta gamma"),
        (t(2), "alpha beta gamma"), // exact dup of the first
        (t(3), "delta epsilon zeta eta"))
      query.processAllAvailable()
      stream.addData((t(30), "tick"))
      query.processAllAvailable()
      stream.addData((t(60), "tock"))
      query.processAllAvailable()
      val w0 = T0 - (T0 % 600000)
      val rows = spark.sql("select * from report_win").collect()
        .filter(_.getTimestamp(0).getTime == w0)
      assert(rows.nonEmpty, "window 0 never closed")
      val r = rows.head
      assert(r.getLong(1) == 3L) // n_docs
      assert(r.getLong(2) == 10L) // n_tokens: 3 + 3 + 4
      assert(r.getLong(5) == 1L) // one duplicated doc (HLL exact at n=2)
    } finally query.stop()
  }

  test("windowedCorpusReport parity: streaming HLL figures track the exact batch report within 5%") {
    // the monitor's contract vs the batch dataset card (q_corpus_report):
    // counters (n_docs, n_tokens, mean) are EXACT — only the two
    // distinct-based figures are HLL approximations (rsd 1%), so the
    // parity bound is 5% relative error (= 5 sigma; at these
    // cardinalities the sketch is in its exact sparse regime, so the
    // real deviation is 0, but the CONTRACT is the rsd bound)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val docs = stream.toDF().toDF("ts", "text")
    val rep = StreamingStats.windowedCorpusReport(docs,
      windowLen = "10 minutes", watermark = "1 minute")
    val query = rep.writeStream.format("memory").queryName("report_parity")
      .outputMode("append").start()
    try {
      // the whole corpus lands in window 0, split across micro-batches
      // so partial sketches actually merge through the state store
      val ts = new Timestamp(T0 + 60000)
      val (half1, half2) = batchDocs.splitAt(batchDocs.length / 2)
      stream.addData(half1.map(d => (ts, d._2)).toSeq)
      query.processAllAvailable()
      stream.addData(half2.map(d => (ts, d._2)).toSeq)
      query.processAllAvailable()
      stream.addData(Seq((new Timestamp(T0 + 30 * 60000), "tick")))
      query.processAllAvailable()

      val w0 = (T0 + 60000) - ((T0 + 60000) % 600000)
      val got = spark.sql("select * from report_parity").collect()
        .filter(_.getTimestamp(0).getTime == w0).head

      // exact batch figures over the same rows, same kernels
      val batch = spark.createDataFrame(
          spark.sparkContext.parallelize(batchDocs.toSeq.map(d =>
            org.apache.spark.sql.Row(d._2))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
        .withColumn("_nt", coalesce(
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long"),
          lit(0L)))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("_nt")).as("n_tokens"),
          round(avg(col("_nt")), 6).as("mean"),
          countDistinct(graft.functions.TextFunctions.langId(col("text")))
            .as("langs"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("dups"))
        .head()

      assert(got.getLong(1) == batch.getLong(0), "n_docs must be exact")
      assert(got.getLong(2) == batch.getLong(1), "n_tokens must be exact")
      assert(got.getDouble(3) == batch.getDouble(2), "mean must be exact")
      def relErr(a: Long, e: Long): Double =
        if (e == 0L) a.toDouble.abs else math.abs(a - e).toDouble / e
      assert(relErr(got.getLong(4), batch.getLong(3)) <= 0.05,
        s"approx_langs ${got.getLong(4)} vs exact ${batch.getLong(3)}")
      assert(relErr(got.getLong(5), batch.getLong(4)) <= 0.05,
        s"approx_dup_docs ${got.getLong(5)} vs exact ${batch.getLong(4)}")
    } finally query.stop()
  }

  test("windowedHeavyHitterCandidates: closed window carries its heavy tokens") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val docs = stream.toDF().toDF("ts", "text")
    val hh = StreamingStats.windowedHeavyHitterCandidates(docs,
      capacity = 4, windowLen = "10 minutes", watermark = "1 minute")
    val query = hh.writeStream.format("memory").queryName("hh_win")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      // window 0: "alpha" dominates (6 of 10 tokens) across micro-batches
      stream.addData((t(1), "alpha alpha beta"), (t(2), "alpha gamma"))
      query.processAllAvailable()
      stream.addData((t(3), "alpha alpha delta alpha"))
      query.processAllAvailable()
      // push the watermark past window 0 → it closes and emits
      stream.addData((t(30), "closing tick"))
      query.processAllAvailable()
      stream.addData((t(60), "closing tick two"))
      query.processAllAvailable()
      val w0 = T0 - (T0 % 600000)
      val rows = spark.sql("select * from hh_win").collect()
        .filter(_.getTimestamp(0).getTime == w0)
      assert(rows.nonEmpty, "window 0 never closed")
      val cand = rows.head.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // n=10, capacity=4 → anything above 10/5=2 occurrences guaranteed:
      // alpha (6) must be present with lower bound within the MG slack
      assert(cand.contains("alpha"), cand.toString)
      assert(cand("alpha") <= 6L && cand("alpha") >= 6L - 2L, cand.toString)
      assert(cand.size <= 4)
    } finally query.stop()
  }

  test("windowedDriftMonitor: ref-like window reads low, shifted window high, values match the batch op") {
    import graft.ops.ImportanceOps
    val refTexts = Seq.fill(20)("alpha beta gamma delta epsilon")
    val refCounts = ImportanceOps.bucketCountsArray(
      refTexts.toDF("text"), "text", buckets = 256)
    assert(refCounts.sum == 100L)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val docs = stream.toDF().toDF("ts", "text")
    val mon = StreamingStats.windowedDriftMonitor(docs, refCounts,
      windowLen = "10 minutes", watermark = "1 minute")
    val query = mon.writeStream.format("memory").queryName("drift_win")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      // window 0 ≈ the reference mix; window 1 = disjoint vocabulary
      stream.addData((t(1), "alpha beta gamma delta epsilon"),
        (t(2), "alpha beta gamma delta epsilon"))
      query.processAllAvailable()
      stream.addData((t(11), "zulu yankee xray whiskey victor"),
        (t(12), "zulu yankee xray whiskey victor"))
      query.processAllAvailable()
      stream.addData((t(40), "tick"))
      query.processAllAvailable()
      stream.addData((t(70), "tock"))
      query.processAllAvailable()
      val w0 = T0 - (T0 % 600000)
      val rows = spark.sql("select * from drift_win").collect()
        .map(r => r.getTimestamp(0).getTime ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      assert(rows.contains(w0) && rows.contains(w0 + 600000), rows.toString)
      val (n0, kl0, tvd0) = rows(w0)
      val (n1, kl1, tvd1) = rows(w0 + 600000)
      assert(n0 == 10L && n1 == 10L)
      assert(kl1 > kl0 + 0.05, s"shifted window must drift harder: $kl0 vs $kl1")
      assert(tvd1 > tvd0)
      // parity with the batch op on the same rows (round-6 absorbs the
      // HOF-vs-agg summation order)
      val batch = ImportanceOps.distributionDrift(
          refTexts.toDF("text"),
          Seq.fill(2)("zulu yankee xray whiskey victor").toDF("text"),
          "text", buckets = 256)
        .head()
      assert(math.abs(batch.getDouble(2) - kl1) <= 2e-6,
        s"batch ${batch.getDouble(2)} vs stream $kl1")
      assert(math.abs(batch.getDouble(3) - tvd1) <= 2e-6)
    } finally query.stop()
  }
}
