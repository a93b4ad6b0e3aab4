package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning: Z-order (Morton
  * curve) interleaving of two integral sort keys, plus the per-bucket
  * min/max skipping index that layout exists to serve.
  *
  * Why this is a first-class 100-TB operator: a parquet scan prunes
  * row groups by column min/max statistics. Sorting by ONE key gives
  * perfect pruning on that key and ZERO pruning on every other (each
  * file spans the full domain of the second key). Interleaving the
  * bits of two keys (Delta/Databricks OPTIMIZE ZORDER, Hudi/Iceberg
  * z-ordering — all public designs) makes every z-contiguous bucket a
  * small RECTANGLE in (k1, k2) space, so range predicates on EITHER
  * key skip most buckets. This module computes the z-value (a writer
  * sorts/range-partitions by it — `repartitionByRange(zValue)` — and
  * writes), and the resulting per-bucket skipping stats.
  *
  * Everything is integer shift/mask/divide arithmetic — bit-identical
  * on any engine, no floating point anywhere — so the whole layout is
  * DuckDB-oracle-checkable (q_zorder_layout).
  *
  * Scale shape: one tiny 4-value bounds agg (collected — exact and
  * O(1)), then per-row codegen arithmetic and ONE bucket-keyed agg
  * (map-side combinable, `buckets` rows out). The sort a real writer
  * adds is `repartitionByRange` on the z-value — the same shuffle a
  * single-key sort already pays; z-order costs nothing extra at write
  * time and wins every multi-predicate read.
  */
object LayoutOps {

  /** Morton bit-spread: the low 16 bits of `x` moved to the even bit
    * positions of a 32-bit value (the standard magic-mask cascade).
    * Pure long shifts/masks — exact, codegen'd, engine-independent.
    */
  def spread16(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton z-value of two 16-bit grid coordinates: `x` on even
    * bit positions, `y` on odd. zValue(5, 3) = 27.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Min/max range-normalize an integral column (by NAME) to the
    * 16-bit grid: ((v − lo) · 65535) div max(1, hi − lo). Integer
    * division on both engines (Spark `div`, DuckDB `//`) — no floating
    * point, so grid cells are exact at any key magnitude.
    */
  def gridCoord(colName: String, lo: Long, hi: Long): Column = {
    val span = math.max(1L, hi - lo)
    expr(s"((cast($colName as bigint) - $lo) * 65535) div $span")
  }

  /** Z-order skipping index: normalize two integral key columns to the
    * 16-bit grid by their min/max, interleave to a Morton z-value,
    * cut the z-range into `buckets` contiguous buckets (the file /
    * row-group boundaries a z-sorted writer produces), and return each
    * bucket's min/max of BOTH keys + row count — exactly the column
    * statistics a predicate-pushdown scan prunes with.
    *
    * Output: (bucket, n, min1, max1, min2, max2) ordered by bucket.
    * Buckets with no rows are absent (a writer writes no empty files).
    */
  def zorderStats(
      df: DataFrame,
      keyCol1: String,
      keyCol2: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bounds = df.agg(
      min(col(keyCol1).cast("long")), max(col(keyCol1).cast("long")),
      min(col(keyCol2).cast("long")), max(col(keyCol2).cast("long"))).head()
    require(!bounds.isNullAt(0), "input is empty or keys all null")
    val (lo1, hi1) = (bounds.getLong(0), bounds.getLong(1))
    val (lo2, hi2) = (bounds.getLong(2), bounds.getLong(3))
    df.withColumn("_z",
        zValue(gridCoord(keyCol1, lo1, hi1), gridCoord(keyCol2, lo2, hi2)))
      .withColumn("_zb", expr(s"(_z * ${buckets.toLong}) div 4294967296"))
      .groupBy(col("_zb").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(keyCol1).cast("long")).as("min1"),
        max(col(keyCol1).cast("long")).as("max1"),
        min(col(keyCol2).cast("long")).as("min2"),
        max(col(keyCol2).cast("long")).as("max2"))
      .orderBy(col("bucket"))
  }

  /** Skipping effectiveness of a bucket-stats index (as produced by
    * [[zorderStats]] or any layout) for a range predicate lo ≤ key ≤ hi
    * on the SECOND key: the number of buckets whose [min2, max2]
    * overlaps the range — the row groups a pushed-down scan must read.
    * Driver-side over the stats table (bucket-count rows, tiny).
    */
  def bucketsRead(stats: DataFrame, lo: Long, hi: Long): Long =
    stats.filter(col("max2") >= lo && col("min2") <= hi).count()
}
