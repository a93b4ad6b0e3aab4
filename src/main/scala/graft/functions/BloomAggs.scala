package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Bloom filter as a `TypedImperativeAggregate` plus a
  * codegen membership probe — the set-membership sketch that pairs
  * with [[SketchAggs]]' frequency sketch.
  *
  * Why it exists: the exact broadcast path in
  * [[graft.ops.CorpusOps.ngramContamination]] caps out when the
  * eval-side distinct-gram SET no longer fits a broadcast (a full
  * benchmark-suite union at 13-grams runs to GBs). A Bloom of the same
  * set is `numBits/8` bytes regardless of entry count — 10 bits/entry
  * gives ~1% false positives, 20 bits ~0.04% (standard Bloom bounds,
  * Bloom 1970) — so the filter always broadcasts, the corpus side
  * drops clean documents map-side, and ONLY bloom-hit candidates reach
  * an exact confirmation join. False positives cost candidate rows,
  * never correctness.
  *
  * Merge is bitwise OR, so the build runs with normal map-side partial
  * aggregation: each task fills a local `numBits`-bit buffer and ONE
  * sketch-sized row per partition shuffles — never the grams. That is
  * the 100 TB build shape; the probe side is a per-row codegen
  * expression with the filter attached as a reference object (same
  * driver-constant mechanics as [[NativeExprs.PqCodes]]' codebook).
  *
  * Input: `array<string>` (a document's grams) or a scalar `string`
  * (a hash/key column — one insert per row); nulls are skipped.
  * Output: the bit array as BINARY (big-endian longs), decoded by
  * [[BloomFunctions.fromBytes]].
  */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_build"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) | StringType => TypeCheckSuccess
      case other =>
        TypeCheckFailure(s"input must be array<string> or string, got $other")
    }
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => GraftHash.bloomInsert(buf, s, numHashes)
      case arr: ArrayData =>
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i))
            GraftHash.bloomInsert(buf, arr.getUTF8String(i), numHashes)
          i += 1
        }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomFunctions.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFunctions.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomFunctions.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuild =
    copy(child = newChildren.head)
}

/** Membership probe against a driver-constant Bloom filter: true iff
  * all `numHashes` probe bits are set (may false-positive, never
  * false-negative for inserted grams). The bit array rides into
  * generated code as a reference object; each probe is one md5 + k bit
  * tests ([[GraftHash.bloomMightContain]]).
  */
case class BloomMightContain(
    child: Expression,
    bits: Array[Long],
    numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case StringType => TypeCheckSuccess
      case other => TypeCheckFailure(s"input must be string, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.bloomMightContain(bits, input.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloombits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftHash.bloomMightContain($bitsRef, $c, $numHashes)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

/** Mergeable hashed-bucket histogram: aggregate a token-array column
  * into a fixed `buckets`-slot count vector (md5 buckets, matching
  * [[graft.ops.CorpusOps.hashBucket]] and the DSIR LMs). The streaming
  * building block for distribution monitoring — ONE aggregation yields
  * the whole per-group distribution, so a windowed streaming query can
  * compute KL/TVD against a static reference without the second
  * (bucket-keyed) aggregation streaming forbids. Merge is elementwise
  * add → map-side partials; one `buckets`-long row per group shuffles,
  * never tokens.
  */
case class BucketCountsAgg(
    child: Expression,
    buckets: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bucket_counts"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(s"input must be array<string>, got $other")
    }
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val b = (GraftHash.md5Prefix32(arr.getUTF8String(i).getBytes)
            % buckets).toInt
          buf(b) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFunctions.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomFunctions.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BucketCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BucketCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BucketCountsAgg =
    copy(child = newChildren.head)
}

/** Column-API face of the Bloom sketch. */
object BloomFunctions {

  /** Aggregate an `array<string>` column into a `numBits`-bit Bloom
    * filter (BINARY); see [[BloomBuild]].
    */
  def bloomBuild(grams: Column, numBits: Int, numHashes: Int): Column =
    GraftSqlShim.column(
      BloomBuild(GraftSqlShim.expression(grams), numBits, numHashes)
        .toAggregateExpression())

  /** Per-row membership probe of `gram` against a collected filter;
    * see [[BloomMightContain]].
    */
  def mightContain(gram: Column, bits: Array[Long], numHashes: Int): Column =
    GraftSqlShim.column(
      BloomMightContain(GraftSqlShim.expression(gram), bits, numHashes))

  /** Aggregate an `array<string>` token column into a `buckets`-slot
    * md5-bucket count vector; see [[BucketCountsAgg]].
    */
  def bucketCounts(tokens: Column, buckets: Int): Column =
    GraftSqlShim.column(
      BucketCountsAgg(GraftSqlShim.expression(tokens), buckets)
        .toAggregateExpression())

  /** Big-endian long packing for the BINARY sketch value. */
  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, s"bloom bytes not long-aligned: ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}
