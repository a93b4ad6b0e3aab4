package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filter / predicate operators (SURVEY §2.2). */
object FilterOps {

  /** F1 — conjunctive equality scope filter from config
    * (reference manager.py:164-175).
    */
  def scopeFilter(filters: Map[String, String]): Column =
    if (filters.isEmpty) lit(true)
    else filters.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)

  /** F2 — Mongo-style operator predicates
    * (reference search/vector.py:351-381). Supported:
    * plain equality, $gt/$gte/$lt/$lte/$ne/$in/$nin/$contains.
    *
    * Null semantics follow the reference's *Python* rules, not SQL:
    * `$ne` passes when the stored value is NULL (None != v is true);
    * `$nin` likewise; comparisons with NULL fail (False). Missing
    * `memory_type` reads as "semantic" (search/vector.py:358-360) —
    * callers pre-coalesce that column.
    */
  sealed trait Pred
  final case class Eq(v: Any) extends Pred
  final case class Gt(v: Any) extends Pred
  final case class Gte(v: Any) extends Pred
  final case class Lt(v: Any) extends Pred
  final case class Lte(v: Any) extends Pred
  final case class Ne(v: Any) extends Pred
  final case class In(vs: Seq[Any]) extends Pred
  final case class Nin(vs: Seq[Any]) extends Pred
  final case class Contains(v: String) extends Pred

  def predicate(field: String, p: Pred): Column = {
    val c = col(field)
    p match {
      case Eq(v) => c === lit(v)
      case Gt(v) => c > lit(v)
      case Gte(v) => c >= lit(v)
      case Lt(v) => c < lit(v)
      case Lte(v) => c <= lit(v)
      // Python None != v is True: NULL passes $ne
      case Ne(v) => c.isNull || c =!= lit(v)
      case In(vs) => c.isin(vs: _*)
      // NULL passes $nin under Python semantics
      case Nin(vs) => c.isNull || !c.isin(vs: _*)
      case Contains(v) => c.isNotNull && c.contains(v)
    }
  }

  /** Type-aware predicate: the reference's `$contains` is Python `in`,
    * which means substring on strings but MEMBERSHIP on lists
    * (search/vector.py:372-375). A bare Column can't branch on type, so
    * this variant inspects the DataFrame schema and picks
    * `array_contains` for array columns, substring `contains` otherwise.
    *
    * Missing keys follow the reference's props.get semantics
    * (search/vector.py:357): actual = None, so $ne/$nin pass and
    * everything else fails — a filter on an unknown field must NOT
    * throw an analysis error. Extension beyond the reference: a field
    * spelled `metadata.<key>` addresses the metadata JSON string (F9
    * decode applied inline), compared as a string.
    */
  def predicateFor(df: org.apache.spark.sql.DataFrame, field: String, p: Pred): Column = {
    val fields = df.schema.fieldNames.toSet
    if (field.startsWith("metadata.") && fields.contains("metadata")) {
      val key = field.stripPrefix("metadata.")
      val extracted = get_json_object(col("metadata"), s"$$.$key")
      p match {
        case Eq(v) => extracted === lit(v.toString)
        case Gt(v) => extracted > lit(v.toString)
        case Gte(v) => extracted >= lit(v.toString)
        case Lt(v) => extracted < lit(v.toString)
        case Lte(v) => extracted <= lit(v.toString)
        case Ne(v) => extracted.isNull || extracted =!= lit(v.toString)
        case In(vs) => extracted.isin(vs.map(_.toString): _*)
        case Nin(vs) => extracted.isNull || !extracted.isin(vs.map(_.toString): _*)
        case Contains(v) => extracted.isNotNull && extracted.contains(v)
      }
    } else if (!fields.contains(field)) {
      // unknown prop: Python None semantics, not an analysis error
      p match {
        case Ne(_) | Nin(_) => lit(true)
        case _ => lit(false)
      }
    } else
      p match {
        case Contains(v)
            if df.schema.fields.exists(f =>
              f.name == field &&
                f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) =>
          col(field).isNotNull && array_contains(col(field), lit(v))
        case other => predicate(field, other)
      }
  }

  def predicates(preds: Map[String, Pred]): Column =
    if (preds.isEmpty) lit(true)
    else preds.map { case (f, p) => predicate(f, p) }.reduce(_ && _)

  def predicatesFor(
      df: org.apache.spark.sql.DataFrame,
      preds: Map[String, Pred]
  ): Column =
    if (preds.isEmpty) lit(true)
    else preds.map { case (f, p) => predicateFor(df, f, p) }.reduce(_ && _)

  /** F3 — soft-expiry filter: drop expired rows unless included
    * (reference search/vector.py:54 et al.). */
  def notExpired(expiredAt: Column, includeExpired: Boolean = false): Column =
    if (includeExpired) lit(true) else expiredAt.isNull

  /** F4 — created_at time-range filter (reference manager.py:713-716). */
  def timeRange(createdAt: Column, after: Option[Long], before: Option[Long]): Column = {
    val lo = after.map(createdAt >= _).getOrElse(lit(true))
    val hi = before.map(createdAt <= _).getOrElse(lit(true))
    lo && hi
  }

  /** F5 — bitemporal point-in-time predicate (reference
    * manager.py:2031-2040): keep iff valid_at IS NULL OR
    * (valid_at <= pit AND (invalid_at IS NULL OR invalid_at > pit)).
    */
  def validAtPointInTime(validAt: Column, invalidAt: Column, pit: Long): Column =
    validAt.isNull || (validAt <= pit && (invalidAt.isNull || invalidAt > pit))

  /** F7 — memory-type filter with the missing→"semantic" compat rule. */
  def memoryType(memoryTypeCol: Column, wanted: String): Column =
    coalesce(memoryTypeCol, lit("semantic")) === wanted
}
