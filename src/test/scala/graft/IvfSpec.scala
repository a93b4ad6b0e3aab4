package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** IVF recall against brute-force ground truth on real testdata
  * (sf0.01 embeddings): the strided seed and the k-means-refined index
  * must both recover most true neighbors through 2-of-8 probed cells,
  * and Lloyd refinement must not lose recall vs the seed.
  */
class IvfSpec extends SparkSuite {

  private val SfDir = "/root/testdata/sf0.01"

  test("k-means IVF recall@10 vs brute force (recall reported)") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10

    def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    val truth = topkSets(SimilarityOps.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding", k))

    def recallOf(assigned: org.apache.spark.sql.DataFrame,
        centroids: org.apache.spark.sql.DataFrame): Double = {
      val got = topkSets(SimilarityOps.ivfTopK(assigned, "vec_id", "embedding",
        centroids, queries, "vec_id", "embedding", k, nProbe = 2))
      val recalls = truth.map { case (q, t) =>
        got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
      }
      recalls.sum / recalls.size
    }

    val (aStr, cStr) = SimilarityOps.ivfIndex(emb, "vec_id", "embedding", numCells = 8)
    val strided = recallOf(aStr, cStr)
    val (aKm, cKm) = SimilarityOps.ivfIndexKMeans(emb, "vec_id", "embedding",
      numCells = 8, lloydIters = 5)
    val kmeans = recallOf(aKm, cKm)

    info(f"recall@10 nProbe=2/8: strided=$strided%.3f kmeans=$kmeans%.3f")
    assert(kmeans >= 0.5, s"kmeans recall too low: $kmeans")
    assert(kmeans >= strided - 0.05,
      s"Lloyd refinement lost recall: strided=$strided kmeans=$kmeans")
  }
}
