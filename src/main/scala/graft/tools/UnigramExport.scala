package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** One-shot exporter behind the pinned q_unigram_encode oracle: trains
  * the unigram-LM vocabulary on a corpus dir
  * ([[graft.ops.CorpusOps.unigramTrain]], the TokenizerSpec-gated
  * trainer), quantizes each logp to 6 decimals (both engines parse the
  * same decimal literal to the same binary64, so quantizing makes the
  * pinned model's arithmetic engine-portable), and writes
  *
  *   - `catalog/UnigramPinnedModel.scala` — the (piece, logp) constants
  *     the Spark-side query encodes with, and
  *   - `tools/unigram_model.json` — the same model for the independent
  *     Python replay (tools/unigram_replay.py) that derives the VALUES
  *     oracle.
  *
  * Usage: runMain graft.tools.UnigramExport <sfDir> [vocabSize]
  * Re-run only when the pinned scenario changes (new testdata or
  * hyperparameters); the gate's point is that the model is FROZEN.
  */
object UnigramExport {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val vocabSize = if (args.length > 1) args(1).toInt else 500
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val trained = graft.ops.CorpusOps
      .unigramTrain(docs, "doc_id", "text", vocabSize = vocabSize,
        maxPieceLen = 4, emRounds = 2)
      .collect()
      .map(r => (r.getString(1), math.rint(r.getDouble(3) * 1e6) / 1e6))

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

    val scala = new StringBuilder
    scala ++= "package graft.catalog\n\n"
    scala ++= "/** FROZEN unigram-LM model behind the q_unigram_encode pinned\n"
    scala ++= s"  * oracle: trained once on sf0.01 documents (vocabSize=$vocabSize,\n"
    scala ++= "  * maxPieceLen=4, emRounds=2) by graft.tools.UnigramExport, logps\n"
    scala ++= "  * quantized to 6 decimals for engine-portable arithmetic. The\n"
    scala ++= "  * independent replay tools/unigram_replay.py encodes with the SAME\n"
    scala ++= "  * constants (tools/unigram_model.json) to derive the expected rows,\n"
    scala ++= "  * so the gate isolates the Viterbi ENCODE semantics (training is\n"
    scala ++= "  * separately gated by TokenizerSpec reference-equality). Do not\n"
    scala ++= "  * edit by hand; regenerate with UnigramExport if the scenario\n"
    scala ++= "  * changes, then regenerate the oracle VALUES with the replay.\n"
    scala ++= "  */\n"
    scala ++= "object UnigramPinnedModel {\n"
    scala ++= "  val Pieces: Seq[String] = Seq(\n    "
    scala ++= trained.map(t => "\"" + esc(t._1) + "\"").mkString(", ")
    scala ++= ")\n"
    scala ++= "  val Logps: Seq[Double] = Seq(\n    "
    scala ++= trained.map(t => f"${t._2}%.6f").mkString(", ")
    scala ++= ")\n"
    scala ++= "}\n"
    Files.writeString(
      Paths.get("src/main/scala/graft/catalog/UnigramPinnedModel.scala"),
      scala.toString)

    val json = trained.map { case (p, lp) =>
      val pj = p.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      f"""["$pj", ${lp}%.6f]"""
    }.mkString("[\n", ",\n", "\n]")
    Files.writeString(Paths.get("tools/unigram_model.json"), json)
    println(s"exported ${trained.length} pieces")
    spark.stop()
  }
}
