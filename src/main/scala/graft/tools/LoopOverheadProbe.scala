package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r14): decompose the per-iteration fixed cost of the
  * driver-loop rows (k-center, MMR, BFS waves) on the bench session
  * shape. Variants over the checkpointed 2000-row embeddings table:
  *
  *   jobfloor  — count() on the checkpoint: scheduler+task+listener floor
  *   reuse     — ONE pre-built argmax Dataset, head() repeatedly:
  *               job floor + result fetch, NO per-iter Catalyst work
  *   replan    — the same argmax plan REBUILT each iteration: adds
  *               analysis/optimization/physical planning per iter
  *   replanlit — replan, but the 64-dim centroid as one array Literal
  *               instead of array(64 × lit): plan-size sensitivity
  *   chain     — the kCenterSelect shape: least(d, d2(c)) lineage chain
  *               rebuilt per iter, checkpoint every 4
  *
  * Usage: runMain graft.tools.LoopOverheadProbe [iters=100] [sfDir]
  */
object LoopOverheadProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 100
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions

    val pts = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
      .localCheckpoint()
    val dim = pts.select(size(col("v"))).head().getInt(0)
    val c0 = Array.fill(dim)(0.123)

    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-10s total $s%7.3f s   per-iter ${s / iters * 1000}%7.1f ms")
    }

    def d2(cv: Array[Double], vecLit: Array[Double] => org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = {
      val cc = cv.map(x => x * x).sum
      VectorFunctions.dotProduct(col("v"), col("v")) -
        lit(2.0) * VectorFunctions.dotProduct(col("v"), vecLit(cv)) + lit(cc)
    }
    val litMany = (a: Array[Double]) => array(a.map(lit): _*)
    val litOne = (a: Array[Double]) => lit(a)

    // warmup: JIT + codegen caches
    (1 to 10).foreach { _ =>
      pts.withColumn("d", d2(c0, litMany)).orderBy(col("d").desc).limit(1).head()
    }

    timed("jobfloor") { (1 to iters).foreach(_ => pts.count()) }

    val fixed = pts.withColumn("d", d2(c0, litMany))
      .orderBy(col("d").desc, col("id")).limit(1)
    timed("reuse") { (1 to iters).foreach(_ => fixed.head()) }

    timed("replan") {
      (1 to iters).foreach { _ =>
        pts.withColumn("d", d2(c0, litMany))
          .orderBy(col("d").desc, col("id")).limit(1).head()
      }
    }

    timed("replanlit") {
      (1 to iters).foreach { _ =>
        pts.withColumn("d", d2(c0, litOne))
          .orderBy(col("d").desc, col("id")).limit(1).head()
      }
    }

    def chain(every: Int, label: String): Unit = timed(label) {
      var carried = pts.withColumn("d", d2(c0, litMany)).localCheckpoint()
      var i = 1
      while (i <= iters) {
        carried.orderBy(col("d").desc, col("id")).limit(1).head()
        val c = Array.fill(dim)(0.001 * i)
        carried = carried.withColumn("d", least(col("d"), d2(c, litMany)))
        if (i % every == 0) carried = carried.localCheckpoint()
        i += 1
      }
    }
    chain(1, "chain1")
    chain(2, "chain2")
    chain(4, "chain4")
    chain(16, "chain16")

    // raw scheduler floor: the same cached RDD, no SQL layer
    val rawRdd = pts.queryExecution.toRdd
    rawRdd.count()
    timed("rddfloor") { (1 to iters).foreach(_ => rawRdd.count()) }

    // localCheckpoint in isolation (fresh copy of a tiny projected DF)
    val slim = pts.select(col("id"), col("v"))
    timed("ckpt") { (1 to iters).foreach(_ => slim.localCheckpoint()) }

    spark.stop()
  }
}
