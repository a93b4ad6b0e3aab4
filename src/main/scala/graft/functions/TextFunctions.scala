package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID and
  * document fingerprinting. All pure `Column` expressions (codegen'd,
  * no UDFs) and all expressible in ANSI-ish SQL so the DuckDB oracle can
  * replay them exactly.
  */
object TextFunctions {

  /** Canonical tokenizer: lowercase, split on runs of non-alphanumerics,
    * drop empties. Matches the oracle SQL
    * `regexp_split_to_array(lower(t), '[^a-z0-9]+')` + filter.
    */
  def tokens(text: Column): Column = {
    // native kernel; the filter(split(lower)) HOF pair it replaces is
    // generator-tested against it in NativeExprPropertySpec
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.Tokens(GraftSqlShim.expression(text)))
  }

  /** HTML→text extraction (codegen'd [[HtmlKernels.extractText]]): the
    * WET-style stage ahead of language-ID — script/style/comment strip,
    * block tags → line breaks, inline tags removed, entities decoded,
    * whitespace collapsed; output is `\n`-separated non-empty lines.
    */
  def htmlToText(html: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.HtmlToText(GraftSqlShim.expression(html)))
  }

  /** Unicode NFC canonicalization (codegen'd) — run before any
    * content-hash dedup so combining-mark encoding variants of the
    * same text collide. Mirrors DuckDB's `nfc_normalize`
    * (q_text_normalize gates the cross-engine agreement).
    */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.NfcNormalize(GraftSqlShim.expression(text)))
  }

  /** One-pass native token statistics (NativeExprs.TokenStats): every
    * scalar token metric below is a field extraction, and repeated calls
    * in one projection collapse to a single kernel run per row via
    * Spark's subexpression elimination. Equivalence with the HOF
    * formulations is generator-tested in NativeExprPropertySpec.
    */
  private def tokenStats(text: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.TokenStats(GraftSqlShim.expression(text)))
  }

  /** Whitespace-ish token count. */
  def tokenCount(text: Column): Column = tokenStats(text).getField("n_tokens")

  /** Distinct-token count (vocabulary size of the doc). */
  def distinctTokenCount(text: Column): Column =
    tokenStats(text).getField("n_distinct")

  /** A BPE-ish subword count proxy: ceil(len(token)/4) summed over
    * tokens — a cheap deterministic stand-in for a BPE piece count.
    */
  def subwordCount(text: Column): Column =
    tokenStats(text).getField("subword_units")

  private def entropyStats(text: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.EntropyStats(GraftSqlShim.expression(text)))
  }

  /** Shannon entropy (nats) over the code points of the concatenated
    * tokens — low values flag character-level repetition; the
    * compression-ratio proxy axis of quality filtering. One kernel pass
    * serves both entropy fields via subexpression elimination.
    */
  def charEntropy(text: Column): Column =
    entropyStats(text).getField("char_entropy")

  /** Shannon entropy (nats) over the token multiset — low values flag
    * template/boilerplate docs whose ratio metrics still look normal.
    */
  def tokenEntropy(text: Column): Column =
    entropyStats(text).getField("token_entropy")

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    when(total === 0, lit(0.0)).otherwise(punct.cast("double") / total)
  }

  /** Fraction of tokens that are English stopwords. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "was", "are"
  )

  def stopwordRatio(text: Column): Column = {
    val st = tokenStats(text)
    val n = st.getField("n_tokens")
    when(n === 0, lit(0.0))
      .otherwise(st.getField("stop_hits").cast("double") / n)
  }

  /** Mean token length — long tokens suggest noise/base64 blobs. */
  def meanTokenLength(text: Column): Column = {
    val st = tokenStats(text)
    val n = st.getField("n_tokens")
    when(n === 0, lit(0.0))
      .otherwise(st.getField("sum_len").cast("double") / n)
  }

  /** Composite quality score in [0,1]:
    * 0.4·lengthScore + 0.3·(1-punctExcess) + 0.3·stopwordPresence.
    * lengthScore = min(1, tokens/100); punctExcess = min(1, 4·punctRatio);
    * stopwordPresence = min(1, 5·stopwordRatio).
    */
  def qualityScore(text: Column): Column = {
    val lengthScore = least(lit(1.0), tokenCount(text).cast("double") / 100.0)
    val punctExcess = least(lit(1.0), punctRatio(text) * 4.0)
    val swPresence = least(lit(1.0), stopwordRatio(text) * 5.0)
    lit(0.4) * lengthScore + lit(0.3) * (lit(1.0) - punctExcess) +
      lit(0.3) * swPresence
  }

  /** Stopword lists for a tiny deterministic language-ID heuristic. */
  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    * standard pretraining-corpus filter battery), as pure Column flags:
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    * and a minimum of distinct common-stopword hits. Thresholds are the
    * published defaults scaled to short synthetic docs where noted.
    */
  def gopherWordCountOk(text: Column, lo: Int = 50, hi: Int = 100000): Column = {
    val n = tokenCount(text)
    n >= lo && n <= hi
  }
  def gopherMeanLenOk(text: Column, lo: Double = 3.0, hi: Double = 10.0): Column = {
    val m = meanTokenLength(text)
    m >= lo && m <= hi
  }
  /** '#'/'@'/'~' occurrences per word (Gopher uses #/… — kept ASCII so
    * Spark and DuckDB `translate` agree bytewise). */
  def gopherSymbolRatio(text: Column): Column = {
    val n = tokenCount(text)
    val sym = (length(text) - length(translate(text, "#@~", ""))).cast("double")
    when(n === 0, lit(0.0)).otherwise(sym / n.cast("double"))
  }
  def gopherStopHits(text: Column): Column =
    tokenStats(text).getField("distinct_stop_hits")

  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "que"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "es", "por"),
    "zh" -> Seq("de5", "shi4", "zai4", "le5", "wo3", "you3", "he2", "ren2")
  )

  /** Language ID: the language whose stopword list has the most hits in
    * the doc's distinct-token set; ties broken alphabetically by code
    * (first wins); "und" when no list matches at all. Argmax is an
    * explicit CASE chain so the SQL oracle can replay it verbatim.
    */
  def langId(text: Column): Column = {
    // fused native kernel; the CASE-chain HOF formulation (which the
    // DuckDB oracle still replays verbatim) is generator-tested against
    // it in NativeExprPropertySpec
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.LangId(GraftSqlShim.expression(text)))
  }

  /** Document fingerprint: md5 of the sorted distinct token set — a
    * content hash invariant to token order and repetition, portable to
    * the SQL oracle.
    */
  def fingerprint(text: Column): Column = {
    // fused native kernel (tokens are pure ASCII post-split, so Java
    // and UTF8String sort orders agree); HOF equivalence is
    // generator-tested in NativeExprPropertySpec
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.TokenFingerprint(
      GraftSqlShim.expression(text)))
  }

  /** Normalized text for exact-dedup: collapse whitespace, lowercase. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** One BPE merge step over a symbol array (left-to-right,
    * non-overlapping — [[NativeExprs.BpeMergeAdjacent]]); (l, r) are
    * per-iteration driver constants.
    */
  def bpeMergeStep(syms: Column, l: String, r: String): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.BpeMergeAdjacent(
      GraftSqlShim.expression(syms), l, r))
  }

  /** BPE-encode a token array with a learned merge sequence — one fused
    * per-row pass ([[NativeExprs.BpeEncode]]); returns the subword
    * units in token order.
    */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.BpeEncode(
      GraftSqlShim.expression(tokens), merges))
  }

  /** Viterbi unigram-LM encode of a token array against a learned
    * piece vocabulary — one fused per-row pass
    * ([[NativeExprs.UnigramEncode]]); returns the pieces in token
    * order. Exact-tie segmentations prefer the longer trailing piece.
    */
  def unigramEncode(tokens: Column, pieces: Seq[String],
      logps: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NativeExprs.UnigramEncode(
      GraftSqlShim.expression(tokens), pieces, logps))
  }
}
