package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.ops.DedupOps

/** Ad-hoc stage profiler for the expensive dedup query — not part of the
  * driver contract; run with runMain graft.tools.QProfile.
  */
object QProfile {
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
      println(f"[qprofile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("grp_b", concat(col("lang"), lit("_"), pmod(col("n_chars"), lit(8))))

    val sh = docs.select(
      col("grp_b").as("grp"), col("doc_id").as("doc"),
      sort_array(HashFunctions.hashedCharShingles(col("text"), 3)).as("sh"))

    time("shingles only")(sh.agg(sum(size(col("sh")))).collect())
    val shC = sh.localCheckpoint()
    time("pairs count (no jaccard)") {
      shC.as("l").join(shC.as("r"), Seq("grp"))
        .filter(col("l.doc") < col("r.doc")).count()
    }
    time("pairs + jaccard (ckpt sh)") {
      shC.as("l").join(shC.as("r"), Seq("grp"))
        .filter(col("l.doc") < col("r.doc"))
        .withColumn("jaccard", HashFunctions.jaccardSortedLong(col("l.sh"), col("r.sh")))
        .filter(col("jaccard") >= 0.5).count()
    }
    time("full query (recompute sh)") {
      DedupOps.ngramJaccardPairs(docs, "doc_id", "text", "grp_b", n = 3, minJaccard = 0.5)
        .count()
    }
    spark.stop()
  }
}
