package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.ops.DedupOps

/** Stage profiler for the minhash/LSH dedup family — not part of the
  * driver contract. (Historical note: this harness isolated the
  * InferFiltersFromGenerate trap — explode of the shingle expression
  * re-evaluated it at the scan, 4.7 s vs 0.5 s at sf0.1 — and sized the
  * native one-pass shingle kernel; PlanSpec now pins the plan shape.)
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mh] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("scan count")(docs.count())
    val p = spark.sessionState.conf.numShufflePartitions
    val sh = docs.select(col("doc_id"), col("text")).repartition(p)
      .select(col("doc_id"), HashFunctions.hashedWordShingles(col("text"), 3).as("sh"))
    println("[mh] total shingles = " +
      sh.select(sum(size(col("sh")))).collect()(0).getLong(0))
    time("shingle+hash pass")(sh.select(sum(size(col("sh")))).collect())
    time("shingle+hash pass 2nd")(sh.select(sum(size(col("sh")))).collect())
    val sig = DedupOps.minhashSignatures(docs, "doc_id", "text", 4, 3)
    time("signatures count")(sig.count())
    time("signatures count 2nd")(sig.count())
    time("q_dedup_minhash (as registered)")(
      graft.catalog.TextQueries.queries("q_dedup_minhash")(spark, sfDir).count())
    time("q_dedup_lsh_pairs (as registered)")(
      graft.catalog.TextQueries.queries("q_dedup_lsh_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
