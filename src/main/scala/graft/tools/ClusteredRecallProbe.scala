package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** Measured answer to "what does the compression ladder do on CLUSTERED
  * embeddings?" (VERDICT r11 #4). Every BASELINE §22 recall number is
  * from the isotropic worst-case corpus, where a shortlist path's
  * recall is pinned to its scanned fraction; the operating guidance
  * ("clustered real embeddings tighten the coarse orderings") was
  * asserted, not measured. This probe plants a k-cluster corpus derived
  * deterministically from the testdata embeddings — cluster id =
  * vec_id % k, vector = blend·center + (1−blend)·original with centers
  * the first k corpus vectors (the MultimodalSpec planted-pattern
  * idea: structure injected with no RNG, reproducible anywhere) — and
  * records recall@10 for each ladder path at the SAME shortlist/probe
  * settings the §22 isotropic row used.
  *
  * Usage: runMain graft.tools.ClusteredRecallProbe <sfDir> [blend]
  * (blend 0.8 ≈ tight clusters; 0.0 = the original isotropic corpus)
  */
object ClusteredRecallProbe {

  /** Deterministic k-cluster corpus over an (id, embedding[float])
    * table: id % clusters picks a center (the first `clusters` corpus
    * vectors), the embedding is the float blend toward that center.
    */
  def clusteredCorpus(emb: DataFrame, clusters: Int, blend: Double): DataFrame = {
    val centers = emb.filter(col("vec_id") < clusters)
      .select(col("vec_id").as("cid"), col("embedding").as("center"))
    emb.withColumn("cid", pmod(col("vec_id"), lit(clusters.toLong)))
      .join(broadcast(centers), Seq("cid"))
      .select(col("vec_id"),
        expr(s"transform(embedding, (x, i) -> cast($blend * element_at(center, i + 1) + ${1.0 - blend} * x as float))")
          .as("embedding"))
  }

  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(got: Map[Long, Set[Long]],
      truth: Map[Long, Set[Long]]): Double = {
    val rs = truth.map { case (q, t) =>
      got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0) }
    rs.sum / rs.size
  }

  /** All five ladder recalls on a corpus; shared by the probe main and
    * IvfSpec's clustered-geometry floors.
    */
  def ladderRecalls(corpus: DataFrame, nQueries: Int = 20, k: Int = 10,
      shortlist: Int = 100): Seq[(String, Double)] = {
    val queries = corpus.filter(col("vec_id") < nQueries)
    val c = corpus.localCheckpoint()
    val q = queries.localCheckpoint()
    val truth = topkSets(SimilarityOps.bruteForceTopK(
      c, "vec_id", "embedding", q, "vec_id", "embedding", k))

    val sq8 = {
      val bounds = SimilarityOps.sq8Bounds(c, "embedding")
      val codes = SimilarityOps.sq8Encode(c, "vec_id", "embedding", bounds)
      topkSets(SimilarityOps.sq8TopK(codes, "vec_id", q, "vec_id", "embedding",
        bounds, k))
    }
    val bin = {
      val th = SimilarityOps.binaryThresholds(c, "embedding")
      val codes = SimilarityOps.binaryEncode(c, "vec_id", "embedding", th)
      topkSets(SimilarityOps.binaryTopKReranked(codes, "vec_id", c, "vec_id",
        "embedding", q, "vec_id", "embedding", th, k, shortlist))
    }
    val trunc = topkSets(SimilarityOps.truncatedTopKReranked(c, "vec_id",
      "embedding", q, "vec_id", "embedding", prefixDims = 16, k, shortlist))
    val pq = {
      val cb = SimilarityOps.pqCodebooks(c, "vec_id", "embedding", 8, 64)
      val codes = SimilarityOps.pqEncode(c, "vec_id", "embedding", cb)
      topkSets(SimilarityOps.pqTopKReranked(codes, "vec_id", c, "vec_id",
        "embedding", q, "vec_id", "embedding", cb, k, shortlist))
    }
    val ivfpq = {
      val (assigned, centroids) =
        SimilarityOps.ivfIndex(c, "vec_id", "embedding", numCells = 8)
      val cb = SimilarityOps.pqCodebooks(c, "vec_id", "embedding", 8, 64)
      val codes = SimilarityOps.pqEncode(assigned, "vec_id", "embedding", cb,
        passthrough = Seq("cell"))
      topkSets(SimilarityOps.pqTopKIvf(codes, "vec_id", c, "vec_id",
        "embedding", centroids, q, "vec_id", "embedding", cb,
        k, nProbe = 6, shortlist))
    }
    Seq("sq8" -> recallOf(sq8, truth), "binary" -> recallOf(bin, truth),
      "truncated" -> recallOf(trunc, truth), "pq_rerank" -> recallOf(pq, truth),
      "ivfpq" -> recallOf(ivfpq, truth))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val blend = if (args.length > 1) args(1).toDouble else 0.8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val corpus = clusteredCorpus(emb, clusters = 8, blend = blend)
    val rs = ladderRecalls(corpus)
    println(s"clustered-recall sf=$sfDir n=$n blend=$blend clusters=8 " +
      s"shortlist=100 (${100.0 * 100 / n}% of corpus) k=10 queries=20")
    rs.foreach { case (p, r) => println(f"  $p%-10s recall@10 = $r%.3f") }
    spark.stop()
  }
}
