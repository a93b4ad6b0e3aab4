package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native kernels: register the graft expressions
  * in a session's FunctionRegistry so `spark.sql("... graft_cosine(a,
  * b) ...")` works for SQL-first users (notebooks, thrift, dbt-style
  * pipelines) exactly as the Column API does for Scala users — same
  * codegen'd Expressions, zero wrappers.
  *
  * Two entry points:
  *   - [[GraftFunctions.register]] — imperative, for a LIVE session
  *     (spark-shell, an existing app);
  *   - [[GraftSparkExtensions]] — the `spark.sql.extensions`
  *     config-based injection hook
  *     (`--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`),
  *     the standard deploy shape for a cluster-wide library.
  *
  * Sketch/model-parameterized kernels (PQ/SQ8 codebooks, BPE merges,
  * unigram pieces) are deliberately NOT SQL-registered: their
  * constructor arguments are trained artifacts, not literals a SQL
  * call site can carry.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal argument, got $other")
  }

  private def bad(fn: String, args: Seq[Expression]): Nothing =
    throw new IllegalArgumentException(
      s"$fn: wrong number of arguments (${args.size})")

  /** name → builder for every SQL-registrable kernel. */
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { args => args match {
      case Seq(a, b) => NativeExprs.CosineSim(a, b)
      case _ => bad("graft_cosine", args) } },
    "graft_dot" -> { args => args match {
      case Seq(a, b) => NativeExprs.DotProduct(a, b)
      case _ => bad("graft_dot", args) } },
    "graft_tokens" -> { args => args match {
      case Seq(s) => NativeExprs.Tokens(s)
      case _ => bad("graft_tokens", args) } },
    "graft_nfc" -> { args => args match {
      case Seq(s) => NativeExprs.NfcNormalize(s)
      case _ => bad("graft_nfc", args) } },
    "graft_langid" -> { args => args match {
      case Seq(s) => NativeExprs.LangId(s)
      case _ => bad("graft_langid", args) } },
    "graft_fingerprint" -> { args => args match {
      case Seq(s) => NativeExprs.TokenFingerprint(s)
      case _ => bad("graft_fingerprint", args) } },
    "graft_token_stats" -> { args => args match {
      case Seq(s) => NativeExprs.TokenStats(s)
      case _ => bad("graft_token_stats", args) } },
    "graft_entropy" -> { args => args match {
      case Seq(s) => NativeExprs.EntropyStats(s)
      case _ => bad("graft_entropy", args) } },
    "graft_simhash" -> { args => args match {
      case Seq(s, bits) => NativeExprs.SimHashText(s, intArg(bits, "graft_simhash"))
      case _ => bad("graft_simhash", args) } },
    "graft_word_shingles" -> { args => args match {
      case Seq(s, n) => NativeExprs.HashedWordShingles(s, intArg(n, "graft_word_shingles"))
      case _ => bad("graft_word_shingles", args) } },
    "graft_char_shingles" -> { args => args match {
      case Seq(s, n) => NativeExprs.HashedCharShingles(s, intArg(n, "graft_char_shingles"))
      case _ => bad("graft_char_shingles", args) } },
    "graft_minhash_sig" -> { args => args match {
      case Seq(s, n) => NativeExprs.MinhashSig(s, intArg(n, "graft_minhash_sig"))
      case _ => bad("graft_minhash_sig", args) } },
    "graft_intersect_size" -> { args => args match {
      case Seq(a, b) => NativeExprs.SortedIntersectSize(a, b)
      case _ => bad("graft_intersect_size", args) } }
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.NativeExprs", name)

  /** Register every kernel into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), b)
    }

  /** The injection half of [[GraftSparkExtensions]]. */
  def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), b))
    }
}

/** `spark.sql.extensions` hook: every session built with
  * `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * has the graft_* SQL functions from first query.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
