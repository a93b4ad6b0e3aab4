package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE SparkEntry query against a sf dir and write its
  * parquet — the single-query face of [[graft.Verify]] for fast
  * oracle-parity iteration (`tools/check.py` compares the output).
  * Usage: runMain graft.tools.SoloVerify <name[,name2,…]> <sfDir> <outDir>
  */
object SoloVerify {
  def main(args: Array[String]): Unit = {
    val Array(nameArg, sfDir, outDir) = args
    val names = nameArg.split(',').toSeq
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    // dump these queries' oracles (if any) so check.py runs on outDir as-is
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val entries = names.flatMap(n =>
      graft.SparkEntry.oracleSql.get(n).map(sql => s"${q(n)}: ${q(sql)}"))
    if (entries.nonEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        entries.mkString("{", ", ", "}"))
    spark.stop()
  }
}
