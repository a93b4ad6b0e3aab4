package graft

import org.apache.spark.sql.functions._

/** Deterministic expected-output fixtures for the two queries the DuckDB
  * oracle cannot express (sequential greedy MMR; the composed staged
  * pipeline): a hand-computed 4-doc MMR geometry with a known selection
  * order, and a pinned q_pipeline_search result at sf0.001.
  */
class FixtureSpec extends SparkSuite {
  import spark.implicits._

  test("MMR fixture: hand-computed 4-doc geometry selects 1, 3, 2") {
    // query q = (1, 0); unit-ish vectors at 10deg, 20deg, 90deg, 60deg:
    //   d1 cos(q)=0.98481, d2 cos(q)=0.93970, d3 cos(q)=0, d4 cos(q)=0.50001
    //   cos(d1,d2)=0.98479  (near-duplicate pair)
    //   cos(d1,d3)=0.17360  cos(d1,d4)=0.64278
    //   cos(d2,d3)=0.34200  cos(d2,d4)=0.76614  cos(d3,d4)=0.86603
    // lambda=0.3, k=3 (reference vector.py:194-291 greedy):
    //   step 1: best sim            -> d1
    //   step 2: d2 = .3(.9397)-.7(.98479) = -0.40744
    //           d3 = .3(0)    -.7(.17360) = -0.12152  <- max
    //           d4 = .3(.5)   -.7(.64278) = -0.29995
    //   step 3: d2 = -0.40744 (maxSel vs d1)
    //           d4 = .15-.7(.86603)       = -0.45622
    //   -> selection ORDER 1, 3, 2: diversity demotes the near-dup d2
    //      (pure similarity order would be 1, 2, 4)
    val docs = Seq(
      (1L, Array(0.9848f, 0.1736f)),
      (2L, Array(0.9397f, 0.3420f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.5f, 0.866f))
    ).toDF("vec_id", "embedding")
    val out = graft.ops.SearchOps
      .mmr(docs, "embedding", "vec_id", Array(1.0f, 0.0f), k = 3, lambda = 0.3)
      .orderBy(col("mmr_rank"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L))
    // score column carries the ORIGINAL query relevance, not the mmr value
    val scores = out.map(_.getDouble(1))
    assert(math.abs(scores(0) - 0.98481) < 1e-4)
    assert(math.abs(scores(1) - 0.0) < 1e-4)
    assert(math.abs(scores(2) - 0.93970) < 1e-4)
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 2, 3)) // mmr_rank
    // the distributed large-k path picks the identical sequence with
    // identical scores (bit-equal kernels + same tie-break)
    val iter = graft.ops.SearchOps
      .mmrIterative(docs, "embedding", "vec_id", Array(1.0f, 0.0f),
        k = 3, lambda = 0.3)
      .orderBy(col("mmr_rank")).collect()
    assert(iter.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq ==
      out.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq)
  }

  test("MMR large-k path equals the driver loop on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // k past the reference bound, fetchK spanning several checkpoints
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("mmr_rank"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val loop = canon(graft.ops.SearchOps.mmr(
      emb, "embedding", "vec_id", q, k = 25, lambda = 0.5))
    val dist = canon(graft.ops.SearchOps.mmrIterative(
      emb, "embedding", "vec_id", q, k = 25, lambda = 0.5,
      checkpointEvery = 4))
    assert(dist == loop)
    assert(loop.length == 25)
    // batched selection (r15): every batch size must reproduce the
    // sequential loop exactly (certificate-gated in-batch accepts,
    // bit-identical driver cosine); selectBatch = 1 IS the r14 loop
    for (bs <- Seq(1, 3, 8, 64)) {
      val b = canon(graft.ops.SearchOps.mmrIterative(
        emb, "embedding", "vec_id", q, k = 25, lambda = 0.5,
        checkpointEvery = 4, selectBatch = bs))
      assert(b == loop, s"selectBatch=$bs diverged")
    }
  }

  test("pipeline fixture: q_pipeline_search pinned at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val rows = SparkEntry.queries("q_pipeline_search")(spark, dir)
      .select(col("memory_id"), col("score"), col("source"), col("memory_type"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2), r.getString(3)))
      .toSeq
    // pinned from the oracle-era run (CORRECTNESS_r03 rows=8): any
    // unintended change to a pipeline stage shows up as a diff here even
    // though DuckDB cannot replay the staged composition
    val expected = Seq(
      ("10", 0.712595, "vector", "semantic"),
      ("20", 0.604397, "vector", "semantic"),
      ("32", 0.537092, "vector", "semantic"),
      ("8", 0.510262, "vector", "semantic"),
      ("5", 0.509716, "vector", "semantic"),
      ("22", 0.479773, "vector", "semantic"),
      ("14", 0.45155, "vector", "semantic"),
      ("29", 0.451251, "vector", "semantic"))
    assert(rows == expected, s"\nactual:\n${rows.mkString("\n")}")
  }
}
