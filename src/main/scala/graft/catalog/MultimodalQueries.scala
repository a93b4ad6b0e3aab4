package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Multimodal
import Tables._

/** Multimodal-column queries (S10 column form + media plumbing): content
  * parts synthesized deterministically from `documents` (text part per
  * doc, image part for every 5th doc), media payloads as binary columns
  * derived from the doc digest. The decode/feature kernels are the
  * documented stubs — the schemas, explode fan-out and byte-level
  * features are the real, oracle-checked plumbing.
  */
object MultimodalQueries {

  /** documents → (doc_id, parts array<struct<part_type,text,image_url>>). */
  private def withParts(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents").select(
      col("doc_id"),
      when(
        col("doc_id") % 5 === 0,
        array(
          struct(lit("text").as("part_type"), col("text").as("text"),
            lit(null: String).as("image_url")),
          struct(lit("image_url").as("part_type"), lit(null: String).as("text"),
            concat(lit("img://doc/"), col("doc_id")).as("image_url")))
      ).otherwise(
        array(struct(lit("text").as("part_type"), col("text").as("text"),
          lit(null: String).as("image_url")))
      ).as("parts"))

  /** documents → media rows with a binary payload (md5 digest bytes). */
  private def media(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      lit("image/png").as("media_type"),
      unhex(md5(col("text"))).as("data"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_parts" -> { (s, dir) =>
      Multimodal.explodeContentParts(withParts(s, dir), "doc_id", "parts")
        .orderBy(col("doc_id"), col("part_idx"))
    },
    "q_media_features" -> { (s, dir) =>
      val m = media(s, dir)
      m.select(
        col("media_id"),
        Multimodal.mediaLength(col("data")).as("media_len"),
        Multimodal.stubWidth(col("data")).as("width"),
        Multimodal.stubHeight(col("data")).as("height"),
        round(element_at(Multimodal.stubEmbedding(col("data"), 4), 1), 6).as("f0"),
        round(element_at(Multimodal.stubEmbedding(col("data"), 4), 4), 6).as("f3"))
        .orderBy(col("media_id"))
    },
    "q_media_neardup" -> { (s, dir) =>
      // perceptual-hash image near-dup: every 7th doc gets a planted
      // twin payload (last byte zeroed), aHash fingerprints over the
      // stride-sampled pixel grid, banded Hamming pairs at radius 3
      // (pigeonhole-exact for bands=4). The oracle verifies by brute
      // force over ALL pairs — hash-matching it proves the banded path
      // loses nothing at the contract radius.
      val base = media(s, dir)
      val twins = load(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("media_id"),
          lit("image/png").as("media_type"),
          unhex(concat(substring(md5(col("text")), 1, 30), lit("00"))).as("data"))
      val fp = Multimodal.withAHash(base.unionByName(twins), "data", "ahash")
        .select(col("media_id"), col("ahash"))
        .localCheckpoint()
      graft.ops.DedupOps
        .fingerprintNearDupPairs(fp, "media_id", "ahash",
          bits = 32, bands = 4, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_audio_neardup" -> { (s, dir) =>
      // acoustic-fingerprint near-dup: 64-byte "waveform" payloads (4
      // chained digests), every 11th doc gets a planted twin with the
      // last 4 bytes zeroed (an end-truncated copy). Fingerprint = sign
      // of frame-energy deltas over a 33-frame envelope; the tail edit
      // touches only the last 2 energy frames → ≤ 3 delta bits flip, so
      // banded Hamming pairs at radius 3 (bands=4, pigeonhole-exact)
      // find every twin. Oracle verifies by brute force over ALL pairs.
      val d = load(s, dir, "documents")
      def wave(tail: org.apache.spark.sql.Column) = concat(
        md5(col("text")), md5(concat(col("text"), lit("a"))),
        md5(concat(col("text"), lit("b"))), tail)
      val base = d.select(col("doc_id").as("media_id"),
        lit("audio/wav").as("media_type"),
        unhex(wave(md5(concat(col("text"), lit("c"))))).as("data"))
      val twins = d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("media_id"),
          lit("audio/wav").as("media_type"),
          unhex(wave(concat(substring(md5(concat(col("text"), lit("c"))), 1, 24),
            lit("00000000")))).as("data"))
      val fp = Multimodal
        .withAudioFingerprint(base.unionByName(twins), "data", "afp")
        .select(col("media_id"), col("afp"))
        .localCheckpoint()
      graft.ops.DedupOps
        .fingerprintNearDupPairs(fp, "media_id", "afp",
          bits = 32, bands = 4, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_audio_features" -> { (s, dir) =>
      // audio feature extraction surfaced directly (the decode-stage
      // columns the fingerprint consumes): frame-energy envelope over
      // the 64-byte waveform — first/mid/last real frames plus the
      // past-payload frame 32, which must read 0 (the bounds guard),
      // and the packed fingerprint
      val d = load(s, dir, "documents")
      val base = d.select(col("doc_id").as("media_id"),
        unhex(concat(md5(col("text")), md5(concat(col("text"), lit("a"))),
          md5(concat(col("text"), lit("b"))),
          md5(concat(col("text"), lit("c"))))).as("data"))
      Multimodal.withAudioFingerprint(base, "data", "afp")
        .withColumn("fe", Multimodal.frameEnergies("data", 33))
        .select(col("media_id"),
          element_at(col("fe"), 1).as("e0"),
          element_at(col("fe"), 17).as("e16"),
          element_at(col("fe"), 32).as("e31"),
          element_at(col("fe"), 33).as("e_past_end"),
          col("afp"))
        .orderBy(col("media_id"))
    },
    "q_media_frames" -> { (s, dir) =>
      // frame-sample plumbing: 4 equal byte slices; emit per-frame length
      // + frame digest so the fan-out shape is oracle-checked
      val m = media(s, dir).withColumn("frames", Multimodal.frameSample("data", 4))
      // outer: keeps InferFiltersFromGenerate from re-slicing the binary
      // at the scan (frameSample always emits `n` frames)
      m.select(col("media_id"), posexplode_outer(col("frames")).as(Seq("frame_idx", "frame")))
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("frame_len"),
          lower(hex(col("frame"))).as("frame_hex"))
        .orderBy(col("media_id"), col("frame_idx"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_multimodal_parts" ->
      """SELECT * FROM (
        |  SELECT doc_id, 0 AS part_idx, 'text' AS part_type, text,
        |         NULL AS image_url FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1 AS part_idx, 'image_url' AS part_type, NULL AS text,
        |         'img://doc/' || doc_id AS image_url
        |  FROM documents WHERE doc_id % 5 = 0)
        |ORDER BY doc_id, part_idx""".stripMargin,
    "q_media_features" ->
      """WITH d AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents)
        |SELECT media_id,
        |  16::BIGINT AS media_len,
        |  (('0x' || substr(h, 1, 2))::UBIGINT)::BIGINT + 1 AS width,
        |  (('0x' || substr(h, 3, 2))::UBIGINT)::BIGINT + 1 AS height,
        |  round((('0x' || substr(md5_b, 1, 2))::UBIGINT)::DOUBLE / 255.0, 6) AS f0,
        |  round((('0x' || substr(md5_b, 7, 2))::UBIGINT)::DOUBLE / 255.0, 6) AS f3
        |FROM (SELECT media_id, h, md5(h) AS md5_b FROM d)
        |ORDER BY media_id""".stripMargin,
    // brute-force ALL-PAIRS aHash verification (the deliberate oracle
    // inversion: Spark runs the banded path, DuckDB the exhaustive one —
    // a hash match proves pigeonhole-exact recall at radius 3)
    "q_media_neardup" ->
      """WITH m0 AS (
        |  SELECT doc_id AS media_id, lower(md5(text)) AS hx FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(lower(md5(text)), 1, 30) || '00'
        |  FROM documents WHERE doc_id % 7 = 0),
        |fp AS (
        |  SELECT media_id,
        |    [ (('0x' || substr(hx, ((i * 16) // 32) * 2 + 1, 2))::UBIGINT)::BIGINT
        |      for i in range(0, 32) ] AS px
        |  FROM m0),
        |h AS (SELECT media_id, px, list_aggregate(px, 'sum') AS s FROM fp),
        |ah AS (
        |  SELECT media_id,
        |    list_aggregate([CASE WHEN px[i + 1] * 32 > s
        |                         THEN (1::BIGINT << i) ELSE 0::BIGINT END
        |                    for i in range(0, 32)], 'sum') AS ahash
        |  FROM h)
        |SELECT a.media_id AS doc_a, b.media_id AS doc_b,
        |  bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
        |FROM ah a JOIN ah b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // brute-force ALL-PAIRS acoustic-fingerprint verification (same
    // oracle inversion as q_media_neardup): 33-frame energy envelope
    // over the 64-byte payload — frame i = bytes (2i, 2i+1), frame 32
    // is past the payload and contributes 0, exactly like Spark's
    // bounds-guarded kernel
    "q_audio_neardup" ->
      """WITH m0 AS (
        |  SELECT doc_id AS media_id,
        |    lower(md5(text) || md5(text || 'a') || md5(text || 'b')
        |      || md5(text || 'c')) AS hx
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    lower(md5(text) || md5(text || 'a') || md5(text || 'b')
        |      || substr(md5(text || 'c'), 1, 24) || '00000000')
        |  FROM documents WHERE doc_id % 11 = 0),
        |fe AS (
        |  SELECT media_id,
        |    [ (('0x' || substr(hx, i * 4 + 1, 2))::UBIGINT)::BIGINT
        |      + (('0x' || substr(hx, i * 4 + 3, 2))::UBIGINT)::BIGINT
        |      for i in range(0, 32) ] || [0::BIGINT] AS fe
        |  FROM m0),
        |fp AS (
        |  SELECT media_id,
        |    list_aggregate([CASE WHEN fe[i + 2] > fe[i + 1]
        |                         THEN (1::BIGINT << i) ELSE 0::BIGINT END
        |                    for i in range(0, 32)], 'sum') AS afp
        |  FROM fe)
        |SELECT a.media_id AS doc_a, b.media_id AS doc_b,
        |  bit_count(xor(a.afp, b.afp))::BIGINT AS hamming
        |FROM fp a JOIN fp b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.afp, b.afp)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_audio_features" ->
      """WITH m0 AS (
        |  SELECT doc_id AS media_id,
        |    lower(md5(text) || md5(text || 'a') || md5(text || 'b')
        |      || md5(text || 'c')) AS hx
        |  FROM documents),
        |fe AS (
        |  SELECT media_id,
        |    [ (('0x' || substr(hx, i * 4 + 1, 2))::UBIGINT)::BIGINT
        |      + (('0x' || substr(hx, i * 4 + 3, 2))::UBIGINT)::BIGINT
        |      for i in range(0, 32) ] || [0::BIGINT] AS fe
        |  FROM m0),
        |fp AS (
        |  SELECT media_id, fe,
        |    -- ::BIGINT: list_aggregate sum widens, and a float-typed
        |    -- output column would break the engine-vs-oracle compare
        |    list_aggregate([CASE WHEN fe[i + 2] > fe[i + 1]
        |                         THEN (1::BIGINT << i) ELSE 0::BIGINT END
        |                    for i in range(0, 32)], 'sum')::BIGINT AS afp
        |  FROM fe)
        |SELECT media_id, fe[1] AS e0, fe[17] AS e16, fe[32] AS e31,
        |  fe[33] AS e_past_end, afp
        |FROM fp ORDER BY media_id""".stripMargin,
    "q_media_frames" ->
      """WITH d AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
        |f AS (SELECT media_id, i AS frame_idx, substr(h, i * 8 + 1, 8) AS frame_hex
        |      FROM d, (SELECT unnest([0,1,2,3]) AS i))
        |SELECT media_id, frame_idx,
        |  (length(frame_hex) / 2)::BIGINT AS frame_len, frame_hex
        |FROM f ORDER BY media_id, frame_idx""".stripMargin
  )
}
