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
}
