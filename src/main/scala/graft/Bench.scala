package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline queries against
  * SPARK_GRAFT_SF_DIR and prints ONE bare JSON line (build.sbt sets
  * run/outputStrategy so sbt does not prefix it with "[info] ").
  * Per-query failures are reported by exception name on stderr and as
  * -1 in the JSON so the driver sees which query broke rather than a
  * silent zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed warmup: touch every input table and exercise the codegen'd
    // kernel families (vector math, hashing, window) once, so the first
    // TIMED query measures the operator, not session startup + JIT.
    // Standard benchmarking hygiene; BASELINE.md §4 numbers are recorded
    // with the same harness.
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.{HashFunctions, VectorFunctions}
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
      try {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        emb.select(VectorFunctions.cosineSimilarity(col("embedding"),
          col("embedding")).as("c")).agg(sum("c")).collect()
        val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        docs.select(HashFunctions.jaccardSortedLong(
            sort_array(HashFunctions.hashedCharShingles(col("text"), 3)),
            sort_array(HashFunctions.hashedCharShingles(col("text"), 3))).as("j"))
          .agg(sum("j")).collect()
      } catch { case _: Throwable => () }
    }
    val names =
      if (SparkEntry.benchQueries.nonEmpty) SparkEntry.benchQueries
      else SparkEntry.queries.keys.toSeq.sorted
    val results = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        val sec =
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch {
            case e: Throwable =>
              System.err.println(
                s"[bench] $name failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
              -1.0
          }
        name -> sec
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // bare line on stdout — the driver parses exactly this
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
