package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, content-part arrays as
  * explodable typed columns, and decode / feature-extract / frame-sample
  * operators.
  *
  * The actual image/audio codecs are NOT in this environment, so the
  * decode kernels are clearly-marked deterministic STUBS — but the
  * Spark-side plumbing is real and tested: schemas, the
  * `mapPartitions`-with-iterator batch shape (the Scala analogue of
  * `mapInPandas`), and codegen'd column features that never leave
  * whole-stage codegen.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String, // image/png, audio/wav, video/mp4, ...
      data: Array[Byte],
      meta: Map[String, String]
  )

  /** Decoded-image metadata produced by the decode stage. */
  final case class DecodedImage(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      ok: Boolean
  )

  // ------------------------------------------------------------------
  // content parts → typed columns
  // ------------------------------------------------------------------

  /** Explode an `array<struct<part_type,text,image_url>>` column into
    * one row per part with a stable part index (S10 column form).
    */
  def explodeContentParts(df: DataFrame, idCol: String, partsCol: String): DataFrame =
    df.select(col(idCol), posexplode(col(partsCol)).as(Seq("part_idx", "part")))
      .select(
        col(idCol),
        col("part_idx"),
        col("part.part_type").as("part_type"),
        col("part.text").as("text"),
        col("part.image_url").as("image_url"))

  // ------------------------------------------------------------------
  // decode (mapPartitions batch shape; STUB kernel)
  // ------------------------------------------------------------------

  /** STUB decode kernel: a real build links an image codec here. The
    * deterministic fake reads "dimensions" from the first bytes so the
    * pipeline shape (schema in → schema out, per-partition batching) is
    * fully exercised without the codec.
    */
  private def decodeStub(m: MediaRow): DecodedImage =
    if (m.data.isEmpty) DecodedImage(m.media_id, 0, 0, 0, ok = false)
    else
      DecodedImage(
        m.media_id,
        width = 1 + (m.data(0) & 0xff),
        height = 1 + (m.data(if (m.data.length > 1) 1 else 0) & 0xff),
        channels = 3,
        ok = true)

  /** Decode a media Dataset partition-wise — the `mapInPandas` analogue:
    * one iterator in, one iterator out per partition, no per-row task
    * overhead, arbitrary native calls allowed inside.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    implicit val enc = Encoders.product[DecodedImage]
    media.mapPartitions(_.map(decodeStub))
  }

  // ------------------------------------------------------------------
  // codegen'd column features (no UDFs — oracle-replayable)
  // ------------------------------------------------------------------

  /** Byte length of the media payload. */
  def mediaLength(data: Column): Column = length(data).cast("long")

  /** STUB header metadata as columns: byte k of the payload, read via
    * hex() so the expression stays inside whole-stage codegen.
    */
  def headerByte(data: Column, k: Int): Column =
    conv(substring(hex(data), k * 2 + 1, 2), 16, 10).cast("long")

  /** STUB image dims from header bytes (mirrors [[decodeImages]]'s fake). */
  def stubWidth(data: Column): Column = headerByte(data, 0) + 1L
  def stubHeight(data: Column): Column = headerByte(data, 1) + 1L

  /** STUB feature vector: `dims` (≤ 16) values derived from the payload
    * digest, scaled to [0,1] — deterministic, codegen'd, replayable in
    * SQL. A real build swaps in a vision-model embedding at the same
    * column type (array<double>).
    */
  def stubEmbedding(data: Column, dims: Int): Column = {
    require(dims >= 1 && dims <= 16, "stub embedding dims must be in [1,16]")
    // digest the lowercase-hex form (not raw bytes): engines without
    // BLOB hashing (the SQL oracle) can replay it exactly
    val digest = md5(lower(hex(data)))
    array((0 until dims).map { i =>
      conv(substring(digest, i * 2 + 1, 2), 16, 10).cast("double") / 255.0
    }: _*)
  }

  /** STUB "resize": `n` pixels sampled stride-wise from the payload byte
    * stream (pixel i = byte at i·len/n) — the locality-preserving
    * downsample a real build replaces with decode + bilinear resize to
    * the hash grid. Unlike a digest, nearby payloads give nearby pixel
    * grids, which is the property perceptual hashing needs. Codegen'd
    * column expression over hex() (no UDF), replayed exactly by the SQL
    * oracle.
    */
  def stubPixels(dataColName: String, n: Int): Column = {
    require(n >= 1 && n <= 64, "pixel count must be in [1,64]")
    expr(s"""transform(sequence(0, ${n - 1}), i ->
      cast(conv(substring(hex($dataColName),
        cast((i * length($dataColName)) div $n as int) * 2 + 1, 2), 16, 10)
        as bigint))""")
  }

  /** Perceptual AVERAGE hash (aHash): bit i set iff pixel i exceeds the
    * grid mean, packed into a long — the image-side analogue of text
    * simhash; near-identical payloads land within small Hamming
    * distance, and pair generation reuses the banded Hamming machinery
    * ([[graft.ops.DedupOps.fingerprintNearDupPairs]]). The mean compare
    * is kept in INTEGERS (p·bits > Σp ⟺ p > mean, strictly) so the SQL
    * oracle replays it bit-exactly with no float edge. 32 bits keeps
    * every shift in non-negative long range in both engines. The pixel
    * array and its sum ride as named columns so each evaluates once.
    */
  def withAHash(df: DataFrame, dataCol: String, outCol: String,
      bits: Int = 32): DataFrame = {
    require(bits >= 2 && bits <= 32, "aHash bits must be in [2,32]")
    df.withColumn("__px", stubPixels(dataCol, bits))
      .withColumn("__pxsum", expr("aggregate(__px, 0L, (a, x) -> a + x)"))
      .withColumn(outCol, expr(
        s"""aggregate(zip_with(__px, sequence(0, ${bits - 1}),
           | (p, i) -> if(p * $bits > __pxsum, shiftleft(1L, i), 0L)),
           | 0L, (a, x) -> a + x)""".stripMargin))
      .drop("__px", "__pxsum")
  }

  /** Perceptual DIFFERENCE hash (dHash): bit i set iff pixel i > pixel
    * i+1 over a (bits+1)-pixel strip — the gradient-based sibling of
    * [[withAHash]], insensitive to global brightness shifts.
    */
  def withDHash(df: DataFrame, dataCol: String, outCol: String,
      bits: Int = 32): DataFrame = {
    require(bits >= 2 && bits <= 32, "dHash bits must be in [2,32]")
    df.withColumn("__px", stubPixels(dataCol, bits + 1))
      .withColumn(outCol, expr(
        s"""aggregate(transform(sequence(0, ${bits - 1}),
           | i -> if(element_at(__px, i + 1) > element_at(__px, i + 2),
           |         shiftleft(1L, i), 0L)),
           | 0L, (a, x) -> a + x)""".stripMargin))
      .drop("__px")
  }

  /** Frame sampling for video-ish payloads: `n` equal byte slices as an
    * array<binary> column (the real build decodes frames; the slicing,
    * schema and fan-out are the actual plumbing). SQL-expression form
    * because the DSL `substring` only takes literal offsets.
    */
  def frameSample(dataColName: String, n: Int): Column = {
    require(n >= 1)
    val chunk = s"int(greatest(1, ceil(length($dataColName) / ${n}.0D)))"
    expr(s"transform(sequence(0, ${n - 1}), i -> substring($dataColName, i * $chunk + 1, $chunk))")
  }

  /** STUB audio decode: frame ENERGY envelope — the payload split into
    * `frames` equal byte slices, energy = sum of byte values per slice
    * (the real build decodes PCM and sums |sample| per hop window; the
    * envelope shape, not the codec, is what the fingerprint consumes).
    * Bytes beyond the payload contribute 0, so short tail frames are
    * deterministic. Codegen'd expression over hex() (no UDF), replayed
    * exactly by the SQL oracle.
    */
  def frameEnergies(dataColName: String, frames: Int): Column = {
    require(frames >= 1 && frames <= 64, "frame count must be in [1,64]")
    val chunk = s"int(greatest(1, ceil(length($dataColName) / ${frames}.0D)))"
    expr(s"""transform(sequence(0, ${frames - 1}), i ->
      aggregate(sequence(0, $chunk - 1), 0L, (a, j) ->
        a + if(i * $chunk + j < length($dataColName),
          cast(conv(substring(hex($dataColName), (i * $chunk + j) * 2 + 1, 2),
            16, 10) as bigint), 0L)))""")
  }

  /** Acoustic fingerprint: bit i set iff energy rises from frame i to
    * frame i+1 over a (bits+1)-frame envelope — the audio analogue of
    * [[withDHash]] and of chromaprint's sign-of-delta features:
    * insensitive to global gain (a louder copy has the same envelope
    * SHAPE), sensitive to structure. Near-identical payloads land within
    * small Hamming distance, so pair generation reuses the banded
    * machinery ([[graft.ops.DedupOps.fingerprintNearDupPairs]]).
    */
  def withAudioFingerprint(df: DataFrame, dataCol: String, outCol: String,
      bits: Int = 32): DataFrame = {
    require(bits >= 2 && bits <= 32, "fingerprint bits must be in [2,32]")
    df.withColumn("__fe", frameEnergies(dataCol, bits + 1))
      .withColumn(outCol, expr(
        s"""aggregate(transform(sequence(0, ${bits - 1}),
           | i -> if(element_at(__fe, i + 2) > element_at(__fe, i + 1),
           |         shiftleft(1L, i), 0L)),
           | 0L, (a, x) -> a + x)""".stripMargin))
      .drop("__fe")
  }
}
