package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequency sketches as `TypedImperativeAggregate`s — the
  * UDAF-surface analogue of the scalar kernels in [[NativeExprs]].
  *
  * [[MisraGries]] is the Misra–Gries / frequent-elements summary with
  * `capacity` counters (Misra & Gries 1982; merge rule and mergeability
  * bound from Agarwal et al., "Mergeable Summaries", PODS 2012 — public
  * literature). Guarantees, with n = total token count across the
  * aggregated group:
  *
  *  - every token with true frequency > n / (capacity + 1) is present
  *    in the summary (no false negatives above that threshold), and
  *  - each reported count is a lower bound, short of the true count by
  *    at most n / (capacity + 1),
  *
  * and both survive arbitrary merge trees, so the aggregate runs with
  * normal map-side partial aggregation: each task keeps an O(capacity)
  * buffer, and ONE sketch-sized row per partition shuffles — never the
  * tokens. That is the 100 TB shape: a full-corpus heavy-hitter pass is
  * a single linear scan with constant-size state, where the exact
  * groupBy alternative shuffles the entire token stream.
  *
  * The candidate SET depends on partition arrival order (any MG summary
  * does), which is why [[graft.ops.SketchOps.heavyHitters]] re-counts
  * candidates exactly in a second bounded pass before anything
  * user-visible is produced — the composed result is deterministic and
  * DuckDB-oracle-checkable while the sketch itself stays one-pass
  * mergeable.
  *
  * Input: `array<string>` (a document's tokens); null arrays and null
  * elements are skipped. Output: `array<struct<token, lb>>` sorted by
  * (lb desc, token) with `lb` the surviving lower-bound counter.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity >= 1, "capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_misra_gries"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(s"input must be array<string>, got $other")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Unit-weight insert. On overflow the classic all-counters decrement
    * runs; each such sweep retires `capacity` units of inserted weight,
    * so sweeps happen at most n/capacity times — amortized O(1)/token.
    */
  private def insert(
      buf: mutable.HashMap[UTF8String, Long], token: UTF8String): Unit = {
    buf.get(token) match {
      case Some(c) => buf.update(token, c + 1L)
      case None if buf.size < capacity =>
        // ArrayData getters may return views over reused row memory —
        // stored keys must own their bytes
        buf.update(token.clone(), 1L)
      case None =>
        // sweep over a key snapshot — mutating (even value-only) while a
        // live keysIterator runs is unspecified for Scala collections
        val keys = buf.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val k = keys(i)
          val c = buf(k) - 1L
          if (c == 0L) buf.remove(k) else buf.update(k, c)
          i += 1
        }
    }
  }

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) insert(buf, arr.getUTF8String(i))
        i += 1
      }
    }
    buf
  }

  /** Mergeable-summaries rule: add counters, then if over capacity
    * subtract the (capacity+1)-th largest count from every counter and
    * drop the non-positive ones — at most `capacity` survive and the
    * n/(capacity+1) bound is preserved (PODS 2012, Thm. 1).
    */
  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val keys = buf.keysIterator.toArray // snapshot: no live-iterator mutation
      var i = 0
      while (i < keys.length) {
        val k = keys(i)
        val c = buf(k) - d
        if (c <= 0L) buf.remove(k) else buf.update(k, c)
        i += 1
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray.sortWith { case ((t1, c1), (t2, c2)) =>
      if (c1 != c2) c1 > c2 else t1.compareTo(t2) < 0
    }
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

/** Column-API face of the sketch aggregates. */
object SketchFunctions {

  /** Misra–Gries frequent-elements summary over an `array<string>`
    * column; `capacity` counters → no false negatives above
    * n/(capacity+1). See [[MisraGries]].
    */
  def misraGries(tokens: Column, capacity: Int): Column =
    GraftSqlShim.column(
      MisraGries(GraftSqlShim.expression(tokens), capacity)
        .toAggregateExpression())
}
