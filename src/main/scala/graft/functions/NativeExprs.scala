package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/set hot paths.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
  * are CodegenFallback — every row pays interpreted lambda dispatch and
  * a materialized intermediate array. For a brute-force cosine scan that
  * is the entire cost, so these ops get real `doGenCode`: one fused
  * primitive loop, no allocation, inlined into whole-stage codegen.
  * Semantics (null/zero-norm/length-mismatch) exactly mirror the HOF
  * formulations they replace in [[VectorFunctions]] — accumulation is
  * left-to-right in array order, so results are bit-identical and the
  * DuckDB oracles need no change.
  */
private[functions] object NativeExprs {

  private def elemGetter(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"unsupported array type $other")
  }

  private def elemAt(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => arr.getDouble(i)
    case other => throw new IllegalArgumentException(s"unsupported array type $other")
  }

  private def checkVec(dt: DataType, side: String): Option[String] = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => None
    case other => Some(s"$side input must be array<float|double>, got $other")
  }

  /** cosine(a, b) = dot/(‖a‖·‖b‖); 0.0 when either norm is 0 (checked
    * FIRST, mirroring `when(na === 0 || nb === 0, 0.0)`), null on null
    * input, null element, or length mismatch with non-zero norms (the
    * zip_with-pads-with-null behavior).
    */
  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_cosine"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      checkVec(left.dataType, "left").orElse(checkVec(right.dataType, "right")) match {
        case Some(msg) => TypeCheckFailure(msg)
        case None => TypeCheckSuccess
      }
    }

    // NOT nullSafeEval: the 3-valued when(na === 0 || nb === 0, 0.0)
    // returns 0.0 even when the OTHER side is a top-level NULL array
    // (NULL OR TRUE = TRUE), so a null input must still inspect its
    // partner's norm instead of short-circuiting to null.
    override def eval(input: InternalRow): Any = {
      val a = left.eval(input)
      val b = right.eval(input)
      var sa = 0.0; var sb = 0.0; var dot = 0.0
      var nullA = a == null; var nullB = b == null
      var nx = -1; var ny = -1
      if (a != null) {
        val x = a.asInstanceOf[ArrayData]
        nx = x.numElements()
        var i = 0
        while (i < nx) {
          if (x.isNullAt(i)) nullA = true
          else { val v = elemAt(left.dataType, x, i); sa += v * v }
          i += 1
        }
      }
      if (b != null) {
        val y = b.asInstanceOf[ArrayData]
        ny = y.numElements()
        var i = 0
        while (i < ny) {
          if (y.isNullAt(i)) nullB = true
          else { val v = elemAt(right.dataType, y, i); sb += v * v }
          i += 1
        }
      }
      if (!nullA && !nullB && nx == ny) {
        val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
        var i = 0
        while (i < nx) {
          dot += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i)
          i += 1
        }
      }
      // a null (array or element) makes that side's norm NULL, so its
      // ===0 test can never be true — only a null-free zero-norm side
      // short-circuits the whole expression to 0.0
      val naZero = !nullA && math.sqrt(sa) == 0.0
      val nbZero = !nullB && math.sqrt(sb) == 0.0
      if (naZero || nbZero) 0.0
      else if (nullA || nullB || nx != ny) null
      else dot / (math.sqrt(sa) * math.sqrt(sb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val leftGen = left.genCode(ctx)
      val rightGen = right.genCode(ctx)
      // every local is freshName'd: with non-nullable children Spark
      // inlines snippets at FUNCTION scope, so two instances of this
      // expression in one projection would otherwise redeclare locals
      val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
      val dot = ctx.freshName("dot")
      val nullA = ctx.freshName("nullA"); val nullB = ctx.freshName("nullB")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val v = ctx.freshName("v")
      val naZero = ctx.freshName("naZero"); val nbZero = ctx.freshName("nbZero")
      val gx = elemGetter(left.dataType, leftGen.value.toString, i)
      val gy = elemGetter(right.dataType, rightGen.value.toString, i)
      val code =
        code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = false;
        double ${ev.value} = 0.0;
        double $sa = 0.0, $sb = 0.0, $dot = 0.0;
        boolean $nullA = ${leftGen.isNull}, $nullB = ${rightGen.isNull};
        int $nx = -1, $ny = -1;
        if (!${leftGen.isNull}) {
          $nx = ${leftGen.value}.numElements();
          for (int $i = 0; $i < $nx; $i++) {
            if (${leftGen.value}.isNullAt($i)) { $nullA = true; }
            else { double $v = $gx; $sa += $v * $v; }
          }
        }
        if (!${rightGen.isNull}) {
          $ny = ${rightGen.value}.numElements();
          for (int $i = 0; $i < $ny; $i++) {
            if (${rightGen.value}.isNullAt($i)) { $nullB = true; }
            else { double $v = $gy; $sb += $v * $v; }
          }
        }
        if (!$nullA && !$nullB && $nx == $ny) {
          for (int $i = 0; $i < $nx; $i++) { $dot += ($gx) * ($gy); }
        }
        boolean $naZero = !$nullA && Math.sqrt($sa) == 0.0;
        boolean $nbZero = !$nullB && Math.sqrt($sb) == 0.0;
        if ($naZero || $nbZero) { ${ev.value} = 0.0; }
        else if ($nullA || $nullB || $nx != $ny) { ${ev.isNull} = true; }
        else { ${ev.value} = $dot / (Math.sqrt($sa) * Math.sqrt($sb)); }
        """
      ev.copy(code = code)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** dot(a, b): left-to-right sum of products; null on null input, null
    * element, or length mismatch (mirrors aggregate-over-zip_with).
    */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_dot"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      checkVec(left.dataType, "left").orElse(checkVec(right.dataType, "right")) match {
        case Some(msg) => TypeCheckFailure(msg)
        case None => TypeCheckSuccess
      }
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      if (nx != y.numElements()) return null
      var dot = 0.0
      var i = 0
      while (i < nx) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        dot += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i)
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // freshName'd locals: non-nullable children inline this snippet
        // at function scope, where fixed names would collide
        val nx = ctx.freshName("nx"); val dot = ctx.freshName("dot")
        val anyNull = ctx.freshName("anyNull"); val i = ctx.freshName("i")
        val gx = elemGetter(left.dataType, a, i)
        val gy = elemGetter(right.dataType, b, i)
        s"""
        int $nx = $a.numElements();
        if ($nx != $b.numElements()) { ${ev.isNull} = true; }
        else {
          double $dot = 0.0;
          boolean $anyNull = false;
          for (int $i = 0; $i < $nx; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
            $dot += ($gx) * ($gy);
          }
          if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** SimHash fingerprint from per-token 32-bit hash values (array<long>)
    * in ONE pass: each token votes ±1 on every bit, fingerprint bit i is
    * set when the vote sum is positive. The HOF formulation it replaces
    * ran `bits` separate interpreted aggregate() passes over the hash
    * array (32× the work, interpreted). Null array → null; a null
    * ELEMENT votes -1 on every bit — the HOF's when(bit-test)
    * .otherwise(-1) takes the otherwise branch on a null condition.
    */
  case class SimHashVotes(child: Expression, bits: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(bits >= 1 && bits <= 32, "simhash bits must be in [1,32]")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_simhash_votes"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be array<long>, got $other")
      }
    }

    override def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData]
      val n = xs.numElements()
      val votes = new Array[Int](bits)
      var i = 0
      while (i < n) {
        // null hash mirrors the HOF's when(bit-test).otherwise(-1): the
        // null condition takes the otherwise branch, i.e. a -1 vote on
        // every bit — exactly what h = 0 produces
        val h = if (xs.isNullAt(i)) 0L else xs.getLong(i)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < bits) {
        if (votes(b) > 0) fp |= (1L << b)
        b += 1
      }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, xs => {
        val votes = ctx.freshName("votes")
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val h = ctx.freshName("h"); val b = ctx.freshName("b")
        val fp = ctx.freshName("fp")
        s"""
        int[] $votes = new int[$bits];
        int $n = $xs.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $h = $xs.isNullAt($i) ? 0L : $xs.getLong($i);
          for (int $b = 0; $b < $bits; $b++) {
            if ((($h >> $b) & 1L) == 1L) { $votes[$b]++; } else { $votes[$b]--; }
          }
        }
        long $fp = 0L;
        for (int $b = 0; $b < $bits; $b++) { if ($votes[$b] > 0) $fp |= (1L << $b); }
        ${ev.value} = $fp;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): SimHashVotes =
      copy(child = newChild)
  }

  /** |A ∩ B| for two SORTED DISTINCT array<long> columns via a two-pointer
    * merge — O(|A|+|B|), zero allocation. The pair-join hot path of
    * n-gram Jaccard: callers sort once per document, then every candidate
    * pair intersects in one fused loop instead of building two hash sets
    * (array_intersect) plus a union array per pair.
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sorted_intersect_size"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
        case other => TypeCheckFailure(s"inputs must be array<long>, got $other")
      }
    }

    // a null ELEMENT reached by the merge yields null (mirroring
    // CosineSim), never an undefined ArrayData slot read — the function
    // is exposed to arbitrary SQL as graft_sorted_intersect_size, where
    // array<long> inputs are containsNull by default
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        if (x.isNullAt(i) || y.isNullAt(j)) return null
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
        int $nx = $a.numElements();
        int $ny = $b.numElements();
        int $i = 0, $j = 0, $c = 0;
        while ($i < $nx && $j < $ny) {
          if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
          long $xv = $a.getLong($i); long $yv = $b.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectSize =
      copy(left = newLeft, right = newRight)
  }

  /** Sibling of [[HashedWordShingles]] for CHARACTER n-grams over
    * normalized text with 60-bit hashes — the exact-Jaccard kernel
    * ([[GraftHash.hashedCharShingles]]).
    */
  case class HashedCharShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_char_shingles60"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.hashedCharShingles(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.hashedCharShingles($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): HashedCharShingles =
      copy(child = newChild)
  }

  /** One-pass token statistics struct — the text-analysis battery
    * (q_text_stats / quality rules / BM25 doc lengths) previously walked
    * an interpreted filter(split(...)) tree PER METRIC; with this
    * expression each metric is a field extraction, and Spark's
    * subexpression elimination collapses the repeated TokenStats calls
    * in one projection to a single kernel run per row.
    */
  case class TokenStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("n_distinct", IntegerType, nullable = false),
      StructField("sum_len", LongType, nullable = false),
      StructField("stop_hits", IntegerType, nullable = false),
      StructField("distinct_stop_hits", IntegerType, nullable = false),
      StructField("subword_units", LongType, nullable = false)))
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_token_stats"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.tokenStats(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.tokenStats($c)")

    override protected def withNewChildInternal(newChild: Expression): TokenStats =
      copy(child = newChild)
  }

  /** One-pass Shannon entropy pair (char + token, nats) —
    * [[GraftHash.entropyStats]]; the compression-ratio-proxy quality
    * signal. Struct fields extract under subexpression elimination
    * like [[TokenStats]].
    */
  case class EntropyStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("char_entropy", DoubleType, nullable = false),
      StructField("token_entropy", DoubleType, nullable = false)))
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_entropy_stats"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.entropyStats(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.entropyStats($c)")

    override protected def withNewChildInternal(newChild: Expression): EntropyStats =
      copy(child = newChild)
  }

  /** One-pass simhash from raw text (tokenize + per-occurrence 32-bit
    * md5-prefix + majority vote) — [[GraftHash.simhashText]]; fuses the
    * interpreted transform(tokens, md5) feeding [[SimHashVotes]].
    */
  case class SimHashText(child: Expression, bits: Int) extends UnaryExpression {
    require(bits >= 1 && bits <= 32, "simhash bits must be in [1,32]")
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_simhash_text"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.simhashText(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.simhashText($c, $bits)")

    override protected def withNewChildInternal(newChild: Expression): SimHashText =
      copy(child = newChild)
  }

  /** Canonical token array, natively tokenized — [[GraftHash.tokens]];
    * replaces the interpreted filter(split(lower)) HOF pair.
    */
  /** Unicode NFC canonical composition — [[GraftHash.nfcNormalize]].
    * Codegen'd scalar so the canonicalization pass stays inside
    * whole-stage codegen with the dedup hashing that consumes it.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_nfc"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.nfcNormalize(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.nfcNormalize($c)")

    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  case class Tokens(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_tokens"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.tokens(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.tokens($c)")

    override protected def withNewChildInternal(newChild: Expression): Tokens =
      copy(child = newChild)
  }

  /** Word n-gram shingles WITH multiplicity, natively tokenized —
    * [[GraftHash.wordShinglesAll]] (the repetition-analysis gram
    * generator).
    */
  case class WordShinglesAllExpr(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_word_shingles_all"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.wordShinglesAll(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.wordShinglesAll($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): WordShinglesAllExpr =
      copy(child = newChild)
  }

  /** One-pass language ID (distinct-token stopword hits + alphabetical
    * first-max argmax) — [[GraftHash.langId]].
    */
  case class LangId(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_langid"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.langId(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.langId($c)")

    override protected def withNewChildInternal(newChild: Expression): LangId =
      copy(child = newChild)
  }

  /** One-pass document fingerprint (md5 hex of the sorted distinct token
    * set) — [[GraftHash.tokenFingerprint]].
    */
  case class TokenFingerprint(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_token_fingerprint"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.tokenFingerprint(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.tokenFingerprint($c)")

    override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
      copy(child = newChild)
  }

  /** One-pass hashed word shingles (tokenize → n-gram → md5-prefix-31 →
    * first-occurrence distinct), the hot kernel of every MinHash/LSH
    * query. The Column formulation it replaces walks FOUR interpreted
    * HOF trees per row (filter, transform×2 with a re-evaluated
    * lambda-bound token subtree, array_distinct); this is one fused
    * kernel call inside whole-stage codegen ([[GraftHash]]).
    */
  case class HashedWordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_word_shingles31"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case StringType => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be string, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.hashedWordShingles(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.hashedWordShingles($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): HashedWordShingles =
      copy(child = newChild)
  }

  /** Whole MinHash signature per ROW — min over the hashed-shingle array
    * of each universal-mix hash family member, all `numHashes` mins in
    * one pass ([[GraftHash.minhashSig]]). Replaces the explode →
    * groupBy(id).agg(min×n) shape, whose aggregation exchange is a
    * corpus-keyed shuffle of every signature; signatures are a pure
    * function of one row's shingles, so no shuffle is ever needed to
    * build them. Bit-identical to the aggregation form (property-tested
    * in NativeExprPropertySpec).
    */
  /** PQ code assignment against driver-constant codebooks
    * ([[GraftHash.pqCodes]]): the flat codebook rides the generated
    * code as one referenced object, so Catalyst analysis/codegen cost
    * is O(1) in numCodes — the unrolled-literal form this replaced
    * built numSub × numCodes × subDim-term trees and spent ~40 s per
    * query in the planner at 8 × 64 codes.
    */
  case class PqCodes(child: Expression, cb: Array[Double],
      numSub: Int, numCodes: Int, subDim: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_pq_codes"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      checkVec(child.dataType, "input") match {
        case Some(msg) => TypeCheckFailure(msg)
        case None => TypeCheckSuccess
      }
    }

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.pqCodes(input.asInstanceOf[ArrayData], isFloat, cb,
        numSub, numCodes, subDim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.GraftHash.pqCodes($c, $isFloat, $cbRef, $numSub, $numCodes, $subDim)")
    }

    override protected def withNewChildInternal(newChild: Expression): PqCodes =
      copy(child = newChild)
  }

  /** PQ per-query ADC distance table ([[GraftHash.pqDtab]]); same
    * driver-constant codebook mechanics as [[PqCodes]].
    */
  case class PqDtab(child: Expression, cb: Array[Double],
      numSub: Int, numCodes: Int, subDim: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_pq_dtab"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      checkVec(child.dataType, "input") match {
        case Some(msg) => TypeCheckFailure(msg)
        case None => TypeCheckSuccess
      }
    }

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.pqDtab(input.asInstanceOf[ArrayData], isFloat, cb,
        numSub, numCodes, subDim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.GraftHash.pqDtab($c, $isFloat, $cbRef, $numSub, $numCodes, $subDim)")
    }

    override protected def withNewChildInternal(newChild: Expression): PqDtab =
      copy(child = newChild)
  }

  /** SQ8 scalar-quantization encode ([[GraftHash.sq8Codes]]): one
    * int8-range code per dimension against driver-constant per-dim
    * min/max bounds (same reference-object mechanics as [[PqCodes]]).
    */
  case class Sq8Codes(child: Expression, mins: Array[Double],
      maxs: Array[Double]) extends UnaryExpression {
    require(mins.length == maxs.length && mins.nonEmpty, "bad bounds")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_sq8_codes"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      checkVec(child.dataType, "input") match {
        case Some(msg) => TypeCheckFailure(msg)
        case None => TypeCheckSuccess
      }
    }

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.sq8Codes(input.asInstanceOf[ArrayData], isFloat, mins, maxs)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mnRef = ctx.addReferenceObj("sq8mins", mins, "double[]")
      val mxRef = ctx.addReferenceObj("sq8maxs", maxs, "double[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.GraftHash.sq8Codes($c, $isFloat, $mnRef, $mxRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): Sq8Codes =
      copy(child = newChild)
  }

  /** Asymmetric SQ8 cosine ([[GraftHash.sq8Cosine]]): exact query
    * (left, float/double array) against an SQ8-coded corpus vector
    * (right, array<int>), reconstructed in-kernel from the same
    * driver-constant bounds. Null on a length mismatch.
    */
  case class Sq8Cosine(left: Expression, right: Expression,
      mins: Array[Double], maxs: Array[Double]) extends BinaryExpression {
    require(mins.length == maxs.length && mins.nonEmpty, "bad bounds")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sq8_cosine"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      checkVec(left.dataType, "left") match {
        case Some(msg) => TypeCheckFailure(msg)
        case None => right.dataType match {
          case ArrayType(IntegerType, _) => TypeCheckSuccess
          case other => TypeCheckFailure(s"right must be array<int>, got $other")
        }
      }
    }

    private def isFloat: Boolean =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val q = a.asInstanceOf[ArrayData]
      val c = b.asInstanceOf[ArrayData]
      if (q.numElements() != mins.length || c.numElements() != mins.length) null
      else GraftHash.sq8Cosine(q, isFloat, c, mins, maxs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mnRef = ctx.addReferenceObj("sq8mins", mins, "double[]")
      val mxRef = ctx.addReferenceObj("sq8maxs", maxs, "double[]")
      val dims = mins.length
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() != $dims || $b.numElements() != $dims) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.GraftHash.sq8Cosine(
            $a, $isFloat, $b, $mnRef, $mxRef);
        }
        """)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Sq8Cosine =
      copy(left = newLeft, right = newRight)
  }

  /** Binary-quantization encode ([[GraftHash.binCodes]]): sign bits vs
    * driver-constant per-dim thresholds, packed LSB-first into
    * ceil(dims/64) longs (same reference-object mechanics as
    * [[Sq8Codes]]).
    */
  case class BinCodes(child: Expression, thresholds: Array[Double])
      extends UnaryExpression {
    require(thresholds.nonEmpty, "bad thresholds")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_bin_codes"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      checkVec(child.dataType, "input") match {
        case Some(msg) => TypeCheckFailure(msg)
        case None => TypeCheckSuccess
      }
    }

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.binCodes(input.asInstanceOf[ArrayData], isFloat, thresholds)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val thRef = ctx.addReferenceObj("binth", thresholds, "double[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.GraftHash.binCodes($c, $isFloat, $thRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): BinCodes =
      copy(child = newChild)
  }

  /** Packed-word Hamming distance ([[GraftHash.binHamming]]) between two
    * array<bigint> code columns. Null on a length mismatch.
    */
  case class BinHamming(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_bin_hamming"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
        case (l, r) => TypeCheckFailure(s"both sides must be array<bigint>, got $l / $r")
      }
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) null
      else GraftHash.binHamming(x, y)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.GraftHash.binHamming($a, $b);
        }
        """)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BinHamming =
      copy(left = newLeft, right = newRight)
  }

  case class MinhashSig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    require(numHashes >= 1, "numHashes must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_minhash_sig"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be array<long>, got $other")
      }
    }

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.minhashSig(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.minhashSig($c, $numHashes)")

    override protected def withNewChildInternal(newChild: Expression): MinhashSig =
      copy(child = newChild)
  }

  /** One BPE merge step ([[GraftHash.bpeMerge]]): the (l, r) pair is a
    * per-iteration driver constant, so it rides the expression as plain
    * parameters (codegen pins them as reference objects), and the scan
    * is one fused left-to-right pass per row.
    */
  case class BpeMergeAdjacent(child: Expression, l: String, r: String)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_bpe_merge"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be array<string>, got $other")
      }
    }

    private lazy val lU = org.apache.spark.unsafe.types.UTF8String.fromString(l)
    private lazy val rU = org.apache.spark.unsafe.types.UTF8String.fromString(r)

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.bpeMerge(input.asInstanceOf[ArrayData], lU, rU)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("bpeL", lU,
        "org.apache.spark.unsafe.types.UTF8String")
      val rRef = ctx.addReferenceObj("bpeR", rU,
        "org.apache.spark.unsafe.types.UTF8String")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.bpeMerge($c, $lRef, $rRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeMergeAdjacent =
      copy(child = newChild)
  }

  /** BPE encode of a document's token array with a LEARNED merge
    * sequence ([[GraftHash.bpeEncodeDoc]]): every token is char-split
    * and each merge applied in rank order, one fused per-row pass.
    * The merge table is a driver constant (the output of training), so
    * encoding is a zero-shuffle map over the corpus.
    */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_bpe_encode"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be array<string>, got $other")
      }
    }

    private lazy val ls: Array[String] = merges.map(_._1).toArray
    private lazy val rs: Array[String] = merges.map(_._2).toArray

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.bpeEncodeDoc(input.asInstanceOf[ArrayData], ls, rs)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("bpeEncL", ls, "java.lang.String[]")
      val rRef = ctx.addReferenceObj("bpeEncR", rs, "java.lang.String[]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.bpeEncodeDoc($c, $lRef, $rRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeEncode =
      copy(child = newChild)
  }

  /** Unigram-LM Viterbi encoding with a learned piece vocabulary
    * ([[GraftHash.unigramEncodeDoc]]): like [[BpeEncode]], the model is
    * a driver constant riding the expression (codegen pins the lookup
    * map as a reference object), so encoding is one fused zero-shuffle
    * pass per row.
    */
  case class UnigramEncode(child: Expression, pieces: Seq[String],
      logps: Seq[Double]) extends UnaryExpression {
    require(pieces.length == logps.length, "pieces/logps must align")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_unigram_encode"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckSuccess
        case other => TypeCheckFailure(s"input must be array<string>, got $other")
      }
    }

    private lazy val vocab: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        m.put(pieces(i), java.lang.Double.valueOf(logps(i)))
        i += 1
      }
      m
    }
    private lazy val maxLen: Int =
      if (pieces.isEmpty) 1
      else math.max(1, pieces.iterator
        .map(p => p.codePointCount(0, p.length)).max)

    override protected def nullSafeEval(input: Any): Any =
      GraftHash.unigramEncodeDoc(input.asInstanceOf[ArrayData], vocab, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vRef = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftHash.unigramEncodeDoc($c, $vRef, $maxLen)")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
      copy(child = newChild)
  }

  private def checkString(dt: DataType)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    dt match {
      case StringType => TypeCheckSuccess
      case other => TypeCheckFailure(s"input must be string, got $other")
    }
  }

  /** URL canonicalization ([[UrlKernels.normalize]]): lowercase
    * scheme/host, default-port and fragment strip, tracking-param
    * removal + bytewise param sort — the CCNet/RefinedWeb URL stage as
    * one fused zero-shuffle row kernel.
    */
  case class UrlNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_url_normalize"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkString(child.dataType)
    override protected def nullSafeEval(input: Any): Any =
      UrlKernels.normalize(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UrlKernels.normalize($c)")
    override protected def withNewChildInternal(newChild: Expression): UrlNormalize =
      copy(child = newChild)
  }

  /** Lowercase host extraction ([[UrlKernels.host]]). */
  case class UrlHost(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_url_host"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkString(child.dataType)
    override protected def nullSafeEval(input: Any): Any =
      UrlKernels.host(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UrlKernels.host($c)")
    override protected def withNewChildInternal(newChild: Expression): UrlHost =
      copy(child = newChild)
  }

  /** Registrable-domain extraction from a host
    * ([[UrlKernels.registrableDomain]]): full Public Suffix List
    * semantics over the built-in [[PublicSuffixList]] snapshot.
    */
  case class RegistrableDomain(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_registrable_domain"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkString(child.dataType)
    override protected def nullSafeEval(input: Any): Any =
      UrlKernels.registrableDomain(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.UrlKernels.registrableDomain($c)")
    override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
      copy(child = newChild)
  }

  /** [[RegistrableDomain]] restricted to the ICANN section of the list
    * ([[UrlKernels.registrableDomainIcann]]): registrant-level domains,
    * ignoring PRIVATE-section hoster suffixes.
    */
  case class RegistrableDomainIcann(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_registrable_domain_icann"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkString(child.dataType)
    override protected def nullSafeEval(input: Any): Any =
      UrlKernels.registrableDomainIcann(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.UrlKernels.registrableDomainIcann($c)")
    override protected def withNewChildInternal(newChild: Expression): RegistrableDomainIcann =
      copy(child = newChild)
  }

  /** HTML→text extraction ([[HtmlKernels.extractText]]): script/style/
    * comment strip, block tags → line breaks, inline tags removed,
    * entity decode, whitespace collapse — the WET-style stage ahead of
    * language-ID, as one fused zero-shuffle row kernel.
    */
  case class HtmlToText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "graft_html_to_text"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkString(child.dataType)
    override protected def nullSafeEval(input: Any): Any =
      HtmlKernels.extractText(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HtmlKernels.extractText($c)")
    override protected def withNewChildInternal(newChild: Expression): HtmlToText =
      copy(child = newChild)
  }
}
