package graft

import org.apache.spark.sql.functions._

import graft.api._
import graft.core.GraphStore
import graft.ext._
import graft.sources._

/** S10 message parsing + multimodal plumbing (reference messages.py,
  * vision.py; tests/test_messages.py shapes).
  */
class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  test("parse: plain string becomes a single user message") {
    val (text, parsed, images) = Messages.parse(TextInput("hello world"))
    assert(text == "hello world")
    assert(parsed == Seq(Message("user", "hello world")))
    assert(images.isEmpty)
  }

  test("parse: dict and list forms with role prefixes and names") {
    val (text, parsed, _) = Messages.parse(MessageList(Seq(
      MessageDict("user", Left("hi"), Some("alice")),
      MessageDict("assistant", Left("hello")))))
    assert(text == "alice (user): hi\nassistant: hello")
    assert(parsed.size == 2)
    assert(parsed.head.name.contains("alice"))
  }

  test("parse: multimodal content list concatenates text, collects images") {
    val (text, parsed, images) = Messages.parse(MessageDict("user", Right(Seq(
      TextPart("look at"), TextPart("this"),
      ImageUrlPart("http://x/img.png"), ImageUrlPart("")))))
    assert(text == "user: look at this")
    assert(parsed.head.content == "look at this")
    assert(images.map(_.url) == Seq(Some("http://x/img.png")))
  }

  test("extractActor: last named message wins; fallback to last role") {
    val msgs = Seq(
      Message("user", "a", Some("alice")),
      Message("assistant", "b"),
      Message("user", "c", Some("bob")),
      Message("assistant", "d"))
    assert(Messages.extractActor(msgs) == (Some("bob"), Some("user")))
    assert(Messages.extractActor(Seq(Message("system", "x"))) == (None, Some("system")))
    assert(Messages.extractActor(Nil) == (None, None))
  }

  test("manager addMessages: vision describes images into the text") {
    val m = new MemoryManager(
      spark, MemoryConfig(userId = "alice", enableVision = true),
      new GraphStore(spark), new MockEmbedder(16),
      new ScriptedExtractor(Nil), new AddAllReconciler)
    val r = m.addMessages(
      MessageDict("user", Right(Seq(
        TextPart("see attachment"), ImageUrlPart("img://one"))), Some("alice")),
      infer = false, now = Some(1700000000000L))
    assert(r.events.size == 1)
    val row = m.store.memories.collect().head
    val stored = row.getString(row.fieldIndex("text"))
    assert(stored.startsWith("alice (user): see attachment\n[Image: image "))
    assert(row.getString(row.fieldIndex("actor_id")) == "alice")
    // deterministic: same image, same description
    val m2 = new MemoryManager(
      spark, MemoryConfig(userId = "alice", enableVision = true),
      new GraphStore(spark), new MockEmbedder(16),
      new ScriptedExtractor(Nil), new AddAllReconciler)
    m2.addMessages(
      MessageDict("user", Right(Seq(
        TextPart("see attachment"), ImageUrlPart("img://one"))), Some("alice")),
      infer = false, now = Some(1700000000000L))
    val stored2 = m2.store.memories.collect().head.getString(row.fieldIndex("text"))
    assert(stored == stored2)
  }

  test("decodeImages: mapPartitions batch shape with stub kernel") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", Array[Byte](10, 20, 3, 4), Map.empty),
      Multimodal.MediaRow(2L, "image/png", Array.empty[Byte], Map.empty))
    val ds = spark.createDataset(media)(org.apache.spark.sql.Encoders.product)
    val out = Multimodal.decodeImages(ds).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).width == 11 && out(1L).height == 21 && out(1L).ok)
    assert(!out(2L).ok)
  }

  test("frameSample: n equal slices covering the payload") {
    val df = Seq((1L, Array.range(0, 16).map(_.toByte))).toDF("id", "data")
    val frames = df.select(Multimodal.frameSample("data", 4).as("f"))
      .select(explode(col("f")).as("frame"))
      .select(length(col("frame")).as("l")).collect().map(_.getInt(0))
    assert(frames.toSeq == Seq(4, 4, 4, 4))
  }

  test("perceptual-hash near-dup: planted twin images pair up, distinct images don't") {
    // controlled payloads: a smooth ramp "image", its twin with one byte
    // nudged (≈1 pixel + no mean flip), and two structurally different
    // payloads. Strided sampling → aHash → banded Hamming pairs.
    val ramp = Array.tabulate(64)(i => (i * 4).toByte)
    val twin = ramp.clone(); twin(10) = (twin(10) + 6).toByte
    val inverse = Array.tabulate(64)(i => (255 - i * 4).toByte)
    val stripes = Array.tabulate(64)(i => if (i % 2 == 0) 0.toByte else 200.toByte)
    val df = Seq((1L, ramp), (2L, twin), (3L, inverse), (4L, stripes))
      .toDF("media_id", "data")
    val fp = Multimodal.withAHash(df, "data", "ahash")
      .select(col("media_id"), col("ahash")).localCheckpoint()
    val pairs = graft.ops.DedupOps
      .fingerprintNearDupPairs(fp, "media_id", "ahash",
        bits = 32, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the planted twin pair, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 3)
    // banded result == brute force at the contract radius (pigeonhole)
    val hashes = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      h = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if h <= 3
    } yield (a, b)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == brute)
    // dHash variant fingerprints twins near-identically too
    val dfp = Multimodal.withDHash(df, "data", "dhash")
      .select(col("media_id"), col("dhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(dfp(1L) ^ dfp(2L)) <= 3)
    // ascending ramp (gradient bits all 0) vs descending ramp (all 1)
    assert(java.lang.Long.bitCount(dfp(1L) ^ dfp(3L)) > 3)
  }

  test("acoustic fingerprint: envelope-shape bits, tail-edit twins pair, gain shift doesn't flip bits") {
    // 64-byte "waveforms": a rising-falling envelope, a copy with the
    // last 4 bytes zeroed (end truncation), the same envelope at +40
    // gain (louder copy — identical delta SIGNS, so hamming 0), and an
    // alternating envelope (far away)
    val env = Array.tabulate(64)(i => (math.min(i, 63 - i) * 6).toByte)
    val cut = env.clone(); (60 until 64).foreach(cut(_) = 0.toByte)
    val loud = env.map(b => ((b & 0xff) / 2 + 40).toByte) // halved + offset: same monotonicity
    val alt = Array.tabulate(64)(i => if (i % 4 < 2) 10.toByte else 120.toByte)
    val df = Seq((1L, env), (2L, cut), (3L, loud), (4L, alt))
      .toDF("media_id", "data")
    val fp = Multimodal.withAudioFingerprint(df, "data", "afp")
      .select(col("media_id"), col("afp")).localCheckpoint()
    val hashes = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tail edit touches only the last two energy frames → ≤ 3 delta bits
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(2L)) <= 3)
    // gain/scale change preserves every energy-delta sign → hamming 0
    assert(hashes(1L) == hashes(3L))
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(4L)) > 3)
    // banded pair search finds exactly the near pairs (pigeonhole at r=3)
    val pairs = graft.ops.DedupOps
      .fingerprintNearDupPairs(fp, "media_id", "afp",
        bits = 32, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      h = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if h <= 3
    } yield (a, b)).toSet
    assert(pairs == brute && pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
  }
}
