package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SimilarityOps
import graft.streaming.StreamingSearch

/** Streaming ANN serving: micro-batched probes against a static
  * binary-quantized index return bit-identical top-k to the batch
  * operator, across multiple micro-batches, with zero streaming state.
  */
class StreamingSearchSpec extends SparkSuite {

  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.01"

  test("binaryProbe: streamed micro-batches == batch operator, per batch") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    implicit val sq = spark.sqlContext
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet").cache()
    val th = SimilarityOps.binaryThresholds(emb, "embedding")
    val codes = SimilarityOps.binaryEncode(emb, "vec_id", "embedding", th).cache()

    def batchTopK(ids: Seq[Long]): Set[(Long, Long, Double, Int)] =
      SimilarityOps.binaryTopKReranked(codes, "vec_id", emb, "vec_id", "embedding",
          emb.filter(col("vec_id").isin(ids: _*)), "vec_id", "embedding", th,
          k = 5, shortlist = 50)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet

    val probes = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)

    val stream = MemoryStream[(Long, Array[Float])]
    val queries = stream.toDF().toDF("vec_id", "embedding")
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Double, Int)]]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val query = StreamingSearch.binaryProbe(queries, "vec_id", "embedding",
        codes, "vec_id", emb, "vec_id", "embedding", th,
        k = 5, shortlist = 50, ckpt) { (res, id) =>
      got.synchronized {
        got(id) = res.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .toSet
      }
    }
    try {
      stream.addData(probes(0), probes(1))
      query.processAllAvailable()
      stream.addData(probes(2), probes(3))
      query.processAllAvailable()
    } finally query.stop()

    assert(got.keySet == Set(0L, 1L))
    // each micro-batch's streamed result is exactly the batch operator
    // run on that batch's queries — same kernels, same plan, same rows
    assert(got(0L) == batchTopK(Seq(0L, 1L)))
    assert(got(1L) == batchTopK(Seq(2L, 3L)))
    // the two batches cover disjoint query sets; nothing leaked across
    assert(got(0L).map(_._1) == Set(0L, 1L) && got(1L).map(_._1) == Set(2L, 3L))
  }
}
