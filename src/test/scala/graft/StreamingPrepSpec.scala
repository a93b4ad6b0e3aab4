package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingPrep

/** Streaming prep chain: the stateless quality gates compose with the
  * watermark-bounded exact dedup in one query — low-quality docs never
  * reach dedup state, cross-micro-batch duplicates drop, and survivors
  * carry the gate outputs (lang_pred, n_tokens, content_hash).
  */
class StreamingPrepSpec extends SparkSuite {

  import spark.implicits._

  private val T0 = 1700000000000L

  // 24 words, all-alpha, stopword-rich: passes every Gopher gate
  private val good = "the quick brown fox jumps over the lazy dog and " +
    "then the dog ran away to the old house near the quiet river bank"

  test("prepStream gates quality, drops cross-batch duplicates, keeps fields") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingPrep.prepStream(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("prep_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData(
        (t(1), 1L, good),
        (t(2), 2L, "too short to survive"),            // word-count gate
        (t(3), 3L, good.replace("the", "@@ the ##")))  // symbol-ratio gate
      query.processAllAvailable()
      // casing/whitespace variant of the survivor, later micro-batch:
      // passes the gates but the dedup horizon drops it
      stream.addData((t(5), 4L, good.toUpperCase.replace("  ", " ")))
      query.processAllAvailable()
      val rows = spark.sql("select doc_id, lang_pred, n_tokens from prep_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.map(_._1).toSet == Set(1L))
      assert(rows.head._2 == "en")
      assert(rows.head._3 == 24L)
    } finally query.stop()
  }

  test("prepStream with redactPii scrubs survivors but keys dedup on raw text") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingPrep.prepStream(docs, "doc_id", "text",
        redactPii = true)
      .writeStream.format("memory").queryName("prep_pii_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      // same prose, different PII → different documents, BOTH kept
      val a = good + " contact alice@example.com today"
      val b = good + " contact bob@example.org today"
      stream.addData((t(1), 1L, a), (t(2), 2L, b))
      query.processAllAvailable()
      // exact duplicate of doc 1 (same PII too) in a later batch → dropped
      stream.addData((t(4), 3L, a))
      query.processAllAvailable()
      val rows = spark.sql("select doc_id, text from prep_pii_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(rows.keySet == Set(1L, 2L))
      assert(rows.values.forall(_.endsWith("contact <EMAIL> today")))
    } finally query.stop()
  }

  test("importanceGate composes into a streaming query with zero state") {
    implicit val sq = spark.sqlContext
    // model: bucket of "alpha" positive, everything else negative
    val trainDocs = Seq((1L, "alpha alpha beta", true), (2L, "xx yy zz", false))
      .toDF("doc_id", "text", "is_t")
    val lam = graft.ops.ImportanceOps.lambdaArray(
      trainDocs, "doc_id", "text", $"is_t", buckets = 64)
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingPrep.importanceGate(docs, "text", lam, threshold = 0.0)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData((t(1), 10L, "alpha beta alpha"), (t(2), 11L, "xx yy"))
      query.processAllAvailable()
      stream.addData((t(3), 12L, "beta alpha"))
      query.processAllAvailable()
      val kept = spark.sql("select doc_id from gate_out")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(10L, 12L), kept.toString)
    } finally query.stop()
  }

  test("domainGate applies the static domain prior across micro-batches") {
    implicit val sq = spark.sqlContext
    // the slowly-updated broadcast: a (domain, kept) prior table — the
    // shape q_domain_quality emits. spam.com is curated out;
    // user.github.io (full-PSL registrable domain) is kept.
    val priors = Seq(("spam.com", false), ("user.github.io", true),
        ("news.co.uk", true))
      .toDF("domain", "kept")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "url")
    val query = StreamingPrep.domainGate(docs, "url", priors)
      .writeStream.format("memory").queryName("domain_gate_out")
      .outputMode("append").start()
    try {
      def t(minutes: Long) = new Timestamp(T0 + minutes * 60000)
      stream.addData(
        (t(1), 1L, "https://www.SPAM.com/offer?id=1"),    // blocked
        (t(2), 2L, "https://user.github.io/post/2"),      // kept (PSL)
        (t(3), 3L, "https://brand.new.site/x"))           // unseen: kept
      query.processAllAvailable()
      // second micro-batch: the same static prior still applies, and
      // the gate holds no state between batches
      stream.addData(
        (t(5), 4L, "http://a.spam.com:80/again"),          // blocked
        (t(6), 5L, "https://www.news.co.uk/world"))        // kept
      query.processAllAvailable()
      val rows = spark.sql("select doc_id, domain from domain_gate_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(rows.keySet == Set(2L, 3L, 5L), rows.toString)
      assert(rows(2L) == "user.github.io")
      assert(rows(5L) == "news.co.uk")
      // strict allowlist mode drops the unseen domain
      val strict = StreamingPrep.domainGate(
        Seq((new Timestamp(T0), 9L, "https://brand.new.site/x"))
          .toDF("ts", "doc_id", "url"),
        "url", priors, keepUnseen = false)
      assert(strict.count() == 0)
    } finally query.stop()
  }

  test("domainGate dedups a prior table with duplicate domain keys") {
    // a prior rebuilt by appending batch outputs can carry the same
    // domain more than once; a duplicated key must not fan stream rows
    // out through the join (one output row per input doc, any one
    // verdict per domain)
    implicit val sq = spark.sqlContext
    val dupPriors = Seq(("news.co.uk", true), ("news.co.uk", true),
        ("spam.com", false), ("spam.com", false))
      .toDF("domain", "kept")
    val docs = Seq(
        (new Timestamp(T0), 1L, "https://www.news.co.uk/a"),
        (new Timestamp(T0), 2L, "https://x.spam.com/b"))
      .toDF("ts", "doc_id", "url")
    val out = StreamingPrep.domainGate(docs, "url", dupPriors)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L), out.toString) // exactly once, not twice
  }
}
