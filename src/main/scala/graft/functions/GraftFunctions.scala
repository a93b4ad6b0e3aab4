package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the native kernels — pathway (c) of the custom-
  * operator ladder: the same Catalyst expressions the Column API uses,
  * exposed to `spark.sql(...)` users.
  *
  *   - [[GraftFunctions.register]] installs them into a live session's
  *     function registry (notebooks, tests);
  *   - [[GraftSparkExtensions]] is the `spark.sql.extensions` hook for
  *     cluster-wide deployment (`--conf spark.sql.extensions=
  *     graft.functions.GraftSparkExtensions`).
  */
object GraftFunctions {

  // 5-arg ExpressionInfo ctor is (className, db, name, usage, extended)
  private def info(name: String, usage: String) =
    new ExpressionInfo(NativeExprs.getClass.getName, null, name, usage, "")

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.size != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${args.size}")
      build(args)
    }

  /** (name, usage, builder) for every SQL-exposed kernel. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float/double arrays",
      arity("graft_cosine", 2)(args => NativeExprs.CosineSim(args(0), args(1)))),
    ("graft_dot",
      "graft_dot(a, b) - dot product of two float/double arrays",
      arity("graft_dot", 2)(args => NativeExprs.DotProduct(args(0), args(1)))),
    ("graft_sorted_intersect_size",
      "graft_sorted_intersect_size(a, b) - |A∩B| of two sorted distinct bigint arrays",
      arity("graft_sorted_intersect_size", 2)(
        args => NativeExprs.SortedIntersectSize(args(0), args(1)))),
    ("graft_simhash32",
      "graft_simhash32(hashes) - 32-bit simhash from per-token hash values",
      arity("graft_simhash32", 1)(args => NativeExprs.SimHashVotes(args(0), 32))),
    ("graft_word_shingles31",
      "graft_word_shingles31(text, n) - distinct word n-gram shingles as 31-bit md5-prefix hashes",
      arity("graft_word_shingles31", 2)(args =>
        NativeExprs.HashedWordShingles(args(0), litInt("graft_word_shingles31", args(1))))),
    ("graft_char_shingles60",
      "graft_char_shingles60(text, n) - distinct char n-gram shingles over normalized text as 60-bit md5-prefix hashes",
      arity("graft_char_shingles60", 2)(args =>
        NativeExprs.HashedCharShingles(args(0), litInt("graft_char_shingles60", args(1))))),
    ("graft_word_shingles_all",
      "graft_word_shingles_all(text, n) - word n-gram shingles with multiplicity",
      arity("graft_word_shingles_all", 2)(args =>
        NativeExprs.WordShinglesAllExpr(args(0), litInt("graft_word_shingles_all", args(1))))),
    ("graft_tokens",
      "graft_tokens(text) - canonical lowercase alphanumeric token array",
      arity("graft_tokens", 1)(args => NativeExprs.Tokens(args(0)))),
    ("graft_token_stats",
      "graft_token_stats(text) - struct of one-pass token statistics",
      arity("graft_token_stats", 1)(args => NativeExprs.TokenStats(args(0)))),
    ("graft_langid",
      "graft_langid(text) - stopword-hit language id (en/de/fr/es/zh or und)",
      arity("graft_langid", 1)(args => NativeExprs.LangId(args(0)))),
    ("graft_fingerprint",
      "graft_fingerprint(text) - md5 of the sorted distinct token set",
      arity("graft_fingerprint", 1)(args => NativeExprs.TokenFingerprint(args(0)))),
    ("graft_simhash_text",
      "graft_simhash_text(text) - 32-bit simhash fingerprint from raw text",
      arity("graft_simhash_text", 1)(args => NativeExprs.SimHashText(args(0), 32))),
    ("graft_minhash_sig",
      "graft_minhash_sig(hashes, n) - n-element minhash signature of a hashed-shingle array",
      arity("graft_minhash_sig", 2)(args =>
        NativeExprs.MinhashSig(args(0), litInt("graft_minhash_sig", args(1))))),
    ("graft_nfc",
      "graft_nfc(text) - Unicode NFC canonical composition (pre-dedup canonicalization)",
      arity("graft_nfc", 1)(args => NativeExprs.NfcNormalize(args(0)))),
    ("graft_entropy",
      "graft_entropy(text) - struct of one-pass char/token Shannon entropy statistics",
      arity("graft_entropy", 1)(args => NativeExprs.EntropyStats(args(0))))
  )

  private def litInt(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
    case other => throw new IllegalArgumentException(
      s"$name: n must be an integer literal, got $other")
  }

  /** Install into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(NativeExprs.getClass.getName, null, name, usage, ""),
        builder))
    }
}
