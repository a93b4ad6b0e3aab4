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

  test("dropExactDuplicatesAgainstStore filters history AND horizon") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.{col, md5}
    import graft.functions.TextFunctions
    // the store: hashes of two historical docs
    val store = Seq("historical doc one", "historical doc two")
      .toDF("text")
      .select(md5(TextFunctions.normalizedText(col("text"))).as("content_hash"))
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingDedup.dropExactDuplicatesAgainstStore(
        docs, store, "doc_id", "text", "10 minutes")
      .writeStream.format("memory").queryName("dedup_store_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData(
        (t(1), 1L, "Historical  DOC one"),   // in store (normalized) → dropped
        (t(2), 2L, "a genuinely new doc"))   // fresh → kept
      query.processAllAvailable()
      stream.addData(
        (t(3), 3L, "a genuinely new doc"),   // horizon dup → dropped
        (t(4), 4L, "historical doc two"),    // in store → dropped
        (t(5), 5L, "another new one"))       // fresh → kept
      query.processAllAvailable()
      val ids = spark.sql("select doc_id from dedup_store_out").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(2L, 5L), s"got $ids")
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

  test("minhashLshDuplicates catches planted near-dups across micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls softly on the quiet village roofs at dusk tonight"
    val nearDup = base.replace("quiet", "sleepy") // one word differs
    val query = StreamingDedup
      .minhashLshDuplicates(docs, "doc_id", "text", "10 minutes",
        numHashes = 16, bands = 4, minJaccard = 0.5)
      .writeStream.format("memory").queryName("lsh_dedup_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      // batch 1: the original + an unrelated doc
      stream.addData(
        (t(1), 1L, base),
        (t(1), 2L, "completely different content about distributed query engines"))
      query.processAllAvailable()
      // batch 2 (a LATER micro-batch): the near-dup + another unrelated
      stream.addData(
        (t(3), 3L, nearDup),
        (t(3), 4L, "yet another unrelated text describing parquet file layouts"))
      query.processAllAvailable()
      // batch 3: an exact repeat of doc 2's text, plus fresh content
      stream.addData(
        (t(5), 5L, "completely different content about distributed query engines"),
        (t(5), 6L, "novel sixth document with entirely new words"))
      query.processAllAvailable()
      // collapse multi-band hits per doc — the documented downstream step
      val hits = spark.sql("select id, dup_of, est_jaccard from lsh_dedup_out")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .groupBy(_._1).map { case (id, hs) => id -> hs.head }
      assert(hits.contains("3"), s"near-dup planted across batches missed: $hits")
      assert(hits("3")._2 == "1")
      assert(hits("3")._3 >= 0.5)
      assert(hits.contains("5"), s"exact cross-batch repeat missed: $hits")
      assert(hits("5")._2 == "2")
      assert(hits("5")._3 == 1.0)
      assert(!hits.contains("2") && !hits.contains("4") && !hits.contains("6"),
        s"false positives: $hits")
    } finally query.stop()
  }

  test("minhashLshDuplicatesAgainstStore catches near-dups of corpus docs across micro-batches") {
    implicit val sq = spark.sqlContext
    val corpusA = "the quick brown fox jumps over the lazy dog while rain " +
      "falls softly on the quiet village roofs at dusk tonight"
    val corpusB = "distributed query engines shuffle partitioned data across " +
      "executors while the optimizer prunes columns and pushes filters down"
    // the static store: banded signatures of the historical corpus,
    // built by the batch-side artifact builder
    val store = graft.ops.DedupOps.bandedSignatureStore(
      Seq((10L, corpusA), (20L, corpusB)).toDF("doc_id", "text"),
      "doc_id", "text", numHashes = 16, bands = 4).localCheckpoint()
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingDedup.minhashLshDuplicatesAgainstStore(
        docs, store, "doc_id", "text",
        numHashes = 16, bands = 4, minJaccard = 0.5)
      .writeStream.format("memory").queryName("lsh_store_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      // batch 1: near-dup of corpus doc 10 (one word swapped) + fresh doc
      stream.addData(
        (t(1), 1L, corpusA.replace("quiet", "sleepy")),
        (t(1), 2L, "a wholly original first-batch document about gardens"))
      query.processAllAvailable()
      // batch 2: exact repeat of corpus doc 20 + fresh doc — the store
      // reaches arbitrarily far back, no horizon involved
      stream.addData(
        (t(50), 3L, corpusB),
        (t(50), 4L, "another fresh document mentioning telescopes and tides"))
      query.processAllAvailable()
      val hits = spark.sql("select id, dup_of, est_jaccard from lsh_store_out")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .groupBy(_._1).map { case (id, hs) => id -> hs.head }
      assert(hits.contains("1"), s"store near-dup missed: $hits")
      assert(hits("1")._2 == "10")
      assert(hits("1")._3 >= 0.5)
      assert(hits.contains("3"), s"exact store repeat missed: $hits")
      assert(hits("3")._2 == "20")
      assert(hits("3")._3 == 1.0)
      assert(!hits.contains("2") && !hits.contains("4"),
        s"false positives: $hits")
    } finally query.stop()
  }
}
