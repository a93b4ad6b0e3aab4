package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.SimilarityOps

/** Continuous ANN serving — the streaming face of the quantized search
  * scans (SURVEY §2.12 extension): a stream of arriving queries is
  * probed against a STATIC index, micro-batch by micro-batch, via
  * `foreachBatch` running the exact batch operator. Rank windows are
  * illegal in a pure streaming plan, but inside `foreachBatch` the
  * micro-batch is an ordinary DataFrame — so a streamed probe returns
  * BIT-IDENTICAL top-k to the batch path (what the spec asserts), and
  * every batch-side improvement (kernels, plan shapes, broadcast
  * contracts) serves the stream for free.
  *
  * Scale shape: the static side (code table, raw vectors for re-rank)
  * is read per micro-batch exactly as the batch scan reads it — cache()
  * it once at start for a resident serving index; the per-batch cost is
  * then the batch operator's (one bounded query broadcast over the code
  * scan + keyed re-rank joins). State is ZERO — queries are one-shot,
  * so there is no watermark and nothing accumulates.
  */
object StreamingSearch {

  /** Generic micro-batch probe harness: `search` maps a micro-batch of
    * queries to its result (any batch ANN face — binary, SQ8, IVF, PQ);
    * `emit` receives (result, batchId) for the caller's sink. Empty
    * micro-batches are skipped.
    */
  def probeStream(
      queries: DataFrame,
      checkpointDir: String)(
      search: DataFrame => DataFrame)(
      emit: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) emit(search(batch), batchId)
      }
      .start()

  /** Binary-quantized serving probe: Hamming shortlist over the packed
    * code table + exact cosine re-rank
    * ([[SimilarityOps.binaryTopKReranked]]) per micro-batch of queries.
    */
  def binaryProbe(
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      codes: DataFrame,
      codesId: String,
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      thresholds: Array[Double],
      k: Int,
      shortlist: Int,
      checkpointDir: String)(
      emit: (DataFrame, Long) => Unit): StreamingQuery =
    probeStream(queries, checkpointDir)(batch =>
      SimilarityOps.binaryTopKReranked(codes, codesId, corpus, corpusId,
        corpusEmb, batch, queryId, queryEmb, thresholds, k, shortlist))(emit)
}
