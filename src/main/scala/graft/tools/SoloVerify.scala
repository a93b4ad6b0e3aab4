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
    // dump this query's oracle (if any) so check.py runs on outDir as-is
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        s"{${q(name)}: ${q(sql)}}")
    }
    spark.stop()
  }
}
