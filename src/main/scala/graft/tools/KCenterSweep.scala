package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off operating-point sweep behind the BASELINE k-center note:
  * times [[graft.ops.SampleOps.kCenterSelect]]'s two spec-equal paths
  * head-to-head — recompute (O(k²·n/2) kernel work, and O(k²)
  * accumulated literal-centroid EXPRESSIONS, so planning cost grows
  * with k too) vs carry (O(k·n) work, flat per-step plan, lineage reset
  * every `checkpointEvery` steps) — across k and the carry path's
  * checkpoint cadence. Not a per-round bench row: the k=200 recompute
  * cell alone reads ~3 min at any sf (that asymmetry IS the finding).
  *
  * Usage: runMain graft.tools.KCenterSweep [sfDir]
  */
object KCenterSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count() // warm the scan

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (k <- Seq(8, 32, 64, 128, 200)) {
      time(f"recompute k=$k%3d") {
        graft.ops.SampleOps.kCenterSelect(emb, "vec_id", "embedding", k).count()
      }
      time(f"carry     k=$k%3d ce=4") {
        graft.ops.SampleOps.kCenterSelect(emb, "vec_id", "embedding", k,
          carryMinDist = true, checkpointEvery = 4).count()
      }
    }
    for (ce <- Seq(1, 2, 4, 8, 16, 32)) {
      time(f"carry     k=200 ce=$ce%2d") {
        graft.ops.SampleOps.kCenterSelect(emb, "vec_id", "embedding", 200,
          carryMinDist = true, checkpointEvery = ce).count()
      }
    }
    spark.stop()
  }
}
