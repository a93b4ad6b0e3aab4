package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** One exploded (band, bucket) row of a streaming document. */
private[streaming] final case class BandedDoc(
    ts: Timestamp, id: String, band: Int, key: Long, sig: Seq[Long])

/** Per-bucket state: the first document that claimed the bucket. */
private[streaming] final case class BucketFirst(id: String, sig: Seq[Long])

/** An emitted near-duplicate detection. */
private[streaming] final case class NearDupHit(
    ts: Timestamp, id: String, dup_of: String, band: Int, est_jaccard: Double)

/** Streaming deduplication for ingest pipelines (SURVEY §2.12 extension;
  * the streaming face of [[graft.ops.DedupOps]]): drop exact duplicates
  * by normalized-content hash within a watermark horizon.
  *
  * Scale shape: `dropDuplicatesWithinWatermark` keys state by the
  * 128-bit content hash only — state is one (hash, latest-ts) entry per
  * distinct document seen inside the horizon and is evicted when the
  * watermark passes it, so a long-running ingest job's state is bounded
  * by (arrival rate × horizon), never by total corpus size. Documents
  * whose duplicates can straddle more than `horizon` of event time must
  * go through the batch LSH path instead.
  */
object StreamingDedup {

  /** Input: streaming DataFrame with (`ts` timestamp, `idCol`, `textCol`).
    * Output: first-seen rows only, with the content hash attached.
    * `idCol` documents the caller's id column (it passes through
    * untouched); dedup keys on CONTENT only, never on the id.
    */
  def dropExactDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      watermark: String = "10 minutes"
  ): DataFrame =
    docs
      .withColumn("content_hash", md5(TextFunctions.normalizedText(col(textCol))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Exact dedup against a STATIC corpus store, composed with the
    * horizon dedup: arrivals are checked against the materialized
    * content-hash table of everything ingested in past runs (the same
    * one-column artifact [[graft.ops.DedupOps.incrementalExact]]
    * consumes), then against the stream's own watermark horizon. This
    * closes the gap between the two existing faces: the horizon alone
    * forgets history older than the watermark; the batch incremental
    * path alone can't run continuously.
    *
    * Scale shape: a stream-static LEFT ANTI join — Spark keeps NO
    * stream state for it (the static side is re-scannable per
    * micro-batch, and at scale is a parquet table partition-pruned /
    * broadcast by the planner); the only streaming state remains the
    * horizon's (rate × watermark) hash entries. The store is read as
    * of each micro-batch, so appending to it between batches tightens
    * the filter without a restart.
    */
  def dropExactDuplicatesAgainstStore(
      docs: DataFrame,
      store: DataFrame,
      idCol: String,
      textCol: String,
      watermark: String = "10 minutes"
  ): DataFrame =
    docs
      .withColumn("content_hash", md5(TextFunctions.normalizedText(col(textCol))))
      .join(store.select(col("content_hash")), Seq("content_hash"), "left_anti")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** NEAR-dup streaming dedup at fingerprint granularity: drop documents
    * whose `bits`-wide simhash matches one already seen in the horizon.
    * The simhash vote sum is order- and casing-insensitive over tokens,
    * so word reorderings, whitespace/punctuation edits and many small
    * in-place variants collapse to the SAME fingerprint — caught here at
    * exact-dedup state cost (one (fingerprint, ts) entry per distinct
    * fingerprint in the horizon).
    *
    * Contract: Hamming distance >= 1 is NOT folded in — a banded
    * multi-key keep decision is circular in streaming (whether to insert
    * a band entry depends on all other bands' verdicts); corpora needing
    * radius-k near-dup go through the batch banded path
    * ([[graft.ops.DedupOps.simhashNearDupPairs]]).
    */
  def dropFingerprintDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      watermark: String = "10 minutes",
      bits: Int = 32
  ): DataFrame =
    docs
      .withColumn("simhash", graft.functions.HashFunctions.simhash(col(textCol), bits))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Streaming MinHash-LSH near-dup DETECTION within the watermark
    * horizon — the streaming face of
    * [[graft.ops.DedupOps.minhashLshPairs]]: per-row signatures (the
    * native one-pass kernel — no explode/groupBy, so the signature
    * stage is stateless), banded keys, and one
    * `flatMapGroupsWithState` keyed by (band, bucket) whose state is
    * the FIRST document that claimed the bucket. A later arrival in the
    * same bucket is verified against the stored signature (estimated
    * Jaccard = matching-component fraction) and emitted as a
    * `(id, dup_of, band, est_jaccard)` hit when it clears `minJaccard`.
    *
    * Emits DETECTIONS, not a filtered keep-stream, and a doc colliding
    * in k bands appears up to k times: the same circularity documented
    * on [[dropFingerprintDuplicates]] applies — a multi-key KEEP
    * decision ("drop iff any band matched") cannot be made atomically
    * across band-partitioned state, and Structured Streaming does not
    * admit a second stateful collapse after flatMapGroupsWithState in
    * the same query. Downstream either collapses per micro-batch
    * (`foreachBatch` + `dropDuplicates("id")` — what the spec asserts)
    * or joins the hits against the ingest stream to drop flagged docs.
    *
    * Scale shape: state is one (firstId, signature) entry per DISTINCT
    * band bucket seen inside the horizon — (arrival rate × horizon ×
    * bands) entries, evicted by event-time timeout at the watermark;
    * never proportional to corpus size. Within a micro-batch a bucket's
    * rows are processed in (ts, id) order, so first-claim is
    * deterministic under replay.
    */
  /** Streaming MinHash-LSH near-dup detection against a STATIC
    * banded-signature corpus store
    * ([[graft.ops.DedupOps.bandedSignatureStore]]) — the streaming face
    * of [[graft.ops.DedupOps.incrementalLshPairs]] and the near-dup
    * sibling of [[dropExactDuplicatesAgainstStore]]: every arrival's
    * per-row signature is banded with the SAME md5 key scheme the batch
    * store uses, stream-static joined on (band, key), and verified
    * against the stored signature (estimated Jaccard =
    * matching-component fraction). Emits detections
    * (ts, id, dup_of, band, est_jaccard); a doc colliding with the same
    * store doc in k bands appears k times — collapse per micro-batch
    * downstream (foreachBatch + dropDuplicates, what the spec does), as
    * with [[minhashLshDuplicates]].
    *
    * Scale shape: ZERO streaming state — signature + banding are
    * per-row expressions and a stream-static inner join keeps no state
    * (the static side is re-read per micro-batch, so appending to the
    * store between batches widens coverage without a restart). With the
    * store written partitioned by `band` / bucketed by `key` (the
    * documented layout), each micro-batch probe prunes to its bands and
    * joins without shuffling the store. Unlike the horizon-bounded
    * [[minhashLshDuplicates]], matches reach arbitrarily far back —
    * the two compose: horizon state catches intra-stream dups, the
    * store join catches corpus dups.
    */
  def minhashLshDuplicatesAgainstStore(
      docs: DataFrame,
      store: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      minJaccard: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val arrivals = docs
      .filter(col(textCol).isNotNull)
      .select(col("ts"), col(idCol).cast("string").as("id"),
        graft.functions.HashFunctions.minhashSig(
          graft.functions.HashFunctions.hashedWordShingles(col(textCol), shingleSize),
          numHashes).as("sig"))
      .withColumn("bk", explode_outer(
        graft.functions.HashFunctions.lshBands(col("sig"), bands, rows)))
      .select(col("ts"), col("id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    arrivals
      .join(store.select(col("doc").cast("string").as("dup_of"),
        col("band"), col("key"), col("sig").as("store_sig")),
        Seq("band", "key"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig"), col("store_sig"), (x, y) => x === y),
          b => b)).cast("double") / numHashes)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("ts"), col("id"), col("dup_of"), col("band"),
        col("est_jaccard"))
  }

  def minhashLshDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      watermark: String = "10 minutes",
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      minJaccard: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val horizon = watermark
    // per-row native signature kernel — one fused pass over the shingle
    // array (bit-identical to the array_min/minhashMix HOF form,
    // NativeExprPropertySpec)
    val sig = graft.functions.HashFunctions.minhashSig(col("__sh"), numHashes)
    // band keys: xxhash64 over the band's signature slice + band index
    val bandKeys = array((0 until bands).map(b =>
      xxhash64(concat_ws(",",
        slice(col("sig"), b * rows + 1, rows).cast("array<string>")), lit(b))): _*)
    val banded = docs
      .filter(col(textCol).isNotNull)
      .select(col("ts"), col(idCol).cast("string").as("id"),
        graft.functions.HashFunctions.hashedWordShingles(col(textCol), shingleSize)
          .as("__sh"))
      .withColumn("sig", sig)
      .select(col("ts"), col("id"), col("sig"),
        posexplode(bandKeys).as(Seq("band", "key")))
      .withWatermark("ts", watermark)
      .as[BandedDoc]
    banded
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[BucketFirst, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[BucketFirst]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.id))
            val hits = Seq.newBuilder[NearDupHit]
            var cur = state.getOption
            sorted.foreach { r =>
              cur match {
                case None => cur = Some(BucketFirst(r.id, r.sig))
                case Some(first) if first.id != r.id =>
                  val est = first.sig.zip(r.sig).count(p => p._1 == p._2)
                    .toDouble / numHashes
                  if (est >= minJaccard)
                    hits += NearDupHit(r.ts, r.id, first.id, r.band, est)
                case _ => ()
              }
            }
            state.update(cur.get) // sorted is non-empty: cur is Some
            state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max, horizon)
            hits.result().iterator
          }
      }
      .toDF()
  }
}
