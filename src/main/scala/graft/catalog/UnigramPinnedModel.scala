package graft.catalog

/** FROZEN unigram-LM model behind the q_unigram_encode pinned
  * oracle: trained once on sf0.01 documents (vocabSize=500,
  * maxPieceLen=4, emRounds=2) by graft.tools.UnigramExport, logps
  * quantized to 6 decimals for engine-portable arithmetic. The
  * independent replay tools/unigram_replay.py encodes with the SAME
  * constants (tools/unigram_model.json) to derive the expected rows,
  * so the gate isolates the Viterbi ENCODE semantics (training is
  * separately gated by TokenizerSpec reference-equality). Do not
  * edit by hand; regenerate with UnigramExport if the scenario
  * changes, then regenerate the oracle VALUES with the replay.
  */
object UnigramPinnedModel {
  val Pieces: Seq[String] = Seq(
    "e", "s", "join", "hash", "row", "batc", "h", "scan", "co", "cust", "lumn", "omer", "er", "filt", "mall", "merg", "slow", "or", "orde", "r", "vect", "line", "data", "tabl", "agg", "valu", "key", "ream", "st", "ow", "wind", "a", "park", "g", "part", "roup", "big", "sort", "quer", "y", "fast", "the", "dup", "b", "c", "d", "f", "i", "j", "k", "l", "m", "n", "o", "p", "q", "t", "u", "v", "w")
  val Logps: Seq[Double] = Seq(
    -2.706899, -3.116412, -3.745297, -3.763089, -3.767322, -3.773705, -3.773705, -3.774773, -3.776912, -3.776912, -3.776912, -3.776912, -3.777983, -3.777983, -3.783357, -3.794191, -3.794191, -3.800748, -3.800748, -3.800748, -3.800748, -3.802944, -3.805144, -3.805144, -3.812883, -3.817332, -3.818448, -3.827417, -3.827417, -3.829671, -3.829671, -3.836466, -3.836466, -3.838742, -3.838742, -3.838742, -3.841022, -3.845599, -3.846746, -3.846746, -3.866457, -3.882986, -7.358292, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388, -10.616388)
}
