package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE SparkEntry query against a sf dir and write its
  * parquet — the single-query face of [[graft.Verify]] for fast
  * oracle-parity iteration (`tools/check.py` compares the output).
  * Usage: runMain graft.tools.SoloVerify <queryName> <sfDir> <outDir>
  */
object SoloVerify {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
