package graft

import org.apache.spark.sql.functions._

import graft.ops.LayoutOps

/** Z-order layout: Morton kernel exactness, stats correctness, and the
  * skipping-effectiveness claim the operator exists for (z-buckets
  * prune range predicates on the SECOND key; a single-key linear sort
  * cannot).
  */
class LayoutSpec extends SparkSuite {

  import spark.implicits._

  test("zValue: known Morton codes, monotone grid locality") {
    val df = Seq((5L, 3L), (0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(LayoutOps.zValue(col("x"), col("y")).as("z"))
    val got = df.collect().map(_.getLong(0))
    // interleave(x=101, y=011) = y1 x1 y0 x0 ... = 011011b = 27
    assert(got(0) == 27L)
    assert(got(1) == 0L)
    assert(got(2) == 4294967295L) // all 32 bits set
    assert(got(3) == 1L) // x occupies even positions
    assert(got(4) == 2L) // y occupies odd positions
  }

  test("zorderStats: buckets partition the data, stats are true min/max, deterministic") {
    // 64×64 full grid — every (x, y) combination once
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("k1", "k2")
    val stats = LayoutOps.zorderStats(grid, "k1", "k2", buckets = 16)
      .collect()
    assert(stats.map(_.getLong(1)).sum == 64L * 64) // no row lost
    assert(stats.length == 16) // full grid fills every z range
    // each bucket of a full grid is a rectangle of 1/16 the area; its
    // min/max spans cover at most half of each axis (16 buckets = 4×4
    // z-blocks of 16×16 cells... each z-bucket is 2 adjacent 16x16
    // blocks → spans ≤ 32 on one axis, ≤ 16 on the other)
    stats.foreach { r =>
      val span1 = r.getLong(3) - r.getLong(2)
      val span2 = r.getLong(5) - r.getLong(4)
      assert(span1 <= 31 && span2 <= 31, r.toString)
    }
    val again = LayoutOps.zorderStats(grid.repartition(7), "k1", "k2", 16)
      .collect()
    assert(stats.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("z-order buckets prune second-key ranges; a linear single-key layout cannot") {
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y => (x.toLong, y.toLong)))
      .toDF("k1", "k2")
    val zStats = LayoutOps.zorderStats(grid, "k1", "k2", buckets = 64)
    // linear layout: sort by k1 only, cut into 64 equal files — every
    // file spans the FULL k2 domain
    val linStats = grid
      .withColumn("_f", expr("(k1 * 64) div 128"))
      .groupBy(col("_f").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("k1").as("min1"), max("k1").as("max1"),
        min("k2").as("min2"), max("k2").as("max2"))
    // predicate: k2 in a 1/8-domain band
    val zRead = LayoutOps.bucketsRead(zStats, 0, 15)
    val linRead = LayoutOps.bucketsRead(linStats, 0, 15)
    val zTotal = zStats.count(); val linTotal = linStats.count()
    assert(linRead == linTotal) // linear layout reads EVERYTHING
    assert(zRead * 4 <= zTotal, s"z-order read $zRead of $zTotal")
  }
}
