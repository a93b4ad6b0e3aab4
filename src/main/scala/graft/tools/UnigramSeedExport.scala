package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** One-shot exporter behind the pinned q_unigram_train_round oracle:
  * computes the unigram trainer's SEED model on a corpus dir via the
  * exact shared code path round 1 starts from
  * ([[graft.ops.CorpusOps.unigramSeedModel]] + `unigramRenorm`) and
  * writes `tools/unigram_seed_model.json` as rows of
  * `[piece, count, logp]`, with logp serialized by `Double.toString`
  * (the shortest round-trip decimal — Python's `float()` parses it back
  * to the identical binary64, so the independent replay
  * `tools/unigram_train_replay.py` runs its Viterbi DP on bit-identical
  * ln-probs and every tie resolves the same way it does in the kernel).
  *
  * Usage: runMain graft.tools.UnigramSeedExport <sfDir> [vocabSize]
  * Re-run only when the pinned scenario changes; the gate's point is
  * that the seed model is FROZEN and the round-1 re-count is replayed
  * independently.
  */
object UnigramSeedExport {
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
    val words = graft.ops.CorpusOps.unigramWords(docs, "text")
    val (singles, multi) = graft.ops.CorpusOps
      .unigramSeedModel(words, vocabSize, maxPieceLen = 4, seedFactor = 4)
    val model = (singles ++ multi).sortBy { case (p, c) => (-c, p) }
    val (pieces, logps) = graft.ops.CorpusOps.unigramRenorm(model)

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

    val json = pieces.lazyZip(model.map(_._2)).lazyZip(logps)
      .map { (p, c, lp) => s"""["${esc(p)}", $c, $lp]""" }
      .mkString("[\n", ",\n", "\n]\n")
    Files.write(Paths.get("tools/unigram_seed_model.json"),
      json.getBytes("UTF-8"))
    println(s"wrote tools/unigram_seed_model.json: ${pieces.length} pieces " +
      s"(${singles.length} singles + ${multi.length} multi)")
    spark.stop()
  }
}
