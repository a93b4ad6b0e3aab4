package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.ops.DedupOps

/** Scratch profiler for the q_dedup_minhash stages — not part of the
  * driver contract.
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
    val rep = docs.select(col("doc_id"), col("text")).repartition(p)
    time("repartition count")(rep.count())
    val sh = rep.select(col("doc_id"),
      HashFunctions.hashedWordShingles(col("text"), 3).as("sh"))
    println("[mh] total shingles = " +
      sh.select(sum(size(col("sh")))).collect()(0).getLong(0))
    time("shingle+hash size sum 2nd")(
      sh.select(sum(size(col("sh")))).collect())
    val exploded = sh.select(col("doc_id"), explode(col("sh")).as("h"))
    time("explode count")(exploded.count())
    time("explode count 2nd")(exploded.count())
    exploded.explain("formatted")
    val ckpt = sh.localCheckpoint()
    val expCkpt = ckpt.select(col("doc_id"), explode(col("sh")).as("h"))
    time("explode after checkpoint")(expCkpt.count())
    time("explode after checkpoint 2nd")(expCkpt.count())
    val aggCkpt = expCkpt.groupBy(col("doc_id"))
      .agg(min(HashFunctions.minhashMix(col("h"), 0)).as("m0"),
        min(HashFunctions.minhashMix(col("h"), 1)).as("m1"),
        min(HashFunctions.minhashMix(col("h"), 2)).as("m2"),
        min(HashFunctions.minhashMix(col("h"), 3)).as("m3"))
    time("ckpt 4 mixed mins")(aggCkpt.count())
    time("ckpt 4 mixed mins 2nd")(aggCkpt.count())
    val barrier = sh.repartition(p)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy(col("doc_id"))
      .agg(min(HashFunctions.minhashMix(col("h"), 0)).as("m0"),
        min(HashFunctions.minhashMix(col("h"), 1)).as("m1"),
        min(HashFunctions.minhashMix(col("h"), 2)).as("m2"),
        min(HashFunctions.minhashMix(col("h"), 3)).as("m3"))
    barrier.explain("formatted")
    time("exchange-barrier 4 mixed mins")(barrier.count())
    time("exchange-barrier 4 mixed mins 2nd")(barrier.count())
    time("exchange-barrier orderBy")(barrier.orderBy("doc_id").count())
    val justAgg = exploded.groupBy(col("doc_id"))
      .agg(min(col("h")).as("m"))
    time("groupBy 1 plain min")(justAgg.count())
    val agg4 = exploded.groupBy(col("doc_id"))
      .agg(min(HashFunctions.minhashMix(col("h"), 0)).as("m0"),
        min(HashFunctions.minhashMix(col("h"), 1)).as("m1"),
        min(HashFunctions.minhashMix(col("h"), 2)).as("m2"),
        min(HashFunctions.minhashMix(col("h"), 3)).as("m3"))
    time("groupBy 4 mixed mins")(agg4.count())
    time("groupBy 4 mixed mins 2nd")(agg4.count())
    val sig = DedupOps.minhashSignatures(docs, "doc_id", "text", 4, 3)
    time("signatures count")(sig.count())
    time("signatures count 2nd")(sig.count())
    time("signatures orderBy count")(sig.orderBy(col("doc_id")).count())
    time("full query (as registered)")(
      graft.catalog.TextQueries.queries("q_dedup_minhash")(spark, sfDir).count())
    time("full query 2nd")(
      graft.catalog.TextQueries.queries("q_dedup_minhash")(spark, sfDir).count())
    spark.stop()
  }
}
