package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard packing: assign each document to a shard of
  * ~`targetWeight` total weight (tokens), in deterministic `keyCol`
  * order — the "pack the corpus into ~N-token training shards" step of
  * an LLM data pipeline. shard_id(doc) = floor(exclusivePrefixSum(w) /
  * targetWeight), so a document lands in the shard where it STARTS and
  * an oversized document simply spans shard boundaries on its own.
  *
  * Scale shape — two-level prefix sum, never a global window: range
  * partition by the sort key, per-partition totals (one bounded collect
  * of ≤ numPartitions rows) prefix-summed on the driver, then a
  * PER-PARTITION window adds the broadcast offset. The classic
  * distributed scan pattern; a naive `sum over (order by key)` window
  * moves the whole corpus to ONE partition.
  *
  * Contract: `keyCol` must be UNIQUE per row (a document id) — the
  * packing order is the key order, and duplicate keys would leave the
  * intra-tie order (and thus boundary-straddling shard assignment)
  * engine-dependent. A null weight packs as 0 (the row keeps its place
  * and shard; mirrors SQL window sums ignoring NULLs).
  */
object ShardOps {

  def packShards(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      targetWeight: Long
  ): DataFrame = {
    require(targetWeight > 0, "targetWeight must be positive")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    // checkpoint pins the bucket assignment: spark_partition_id() is a
    // property of the materialized partitioning, not of the row, and
    // must not silently change between the totals pass and the window
    val w0 = coalesce(col(weightCol).cast("long"), lit(0L))
    val ranged = df
      .repartitionByRange(p, col(keyCol))
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint()
    // bounded collect: one row per range bucket
    val totals = ranged.groupBy(col("__bucket"))
      .agg(sum(w0).as("w"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, w) => val o = (b, acc); acc += w; o }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__bucket", "__offset")
    val w = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inclusive: Column = sum(w0).over(w)
    ranged
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn("__exclusive", col("__offset") + inclusive - w0)
      .withColumn("shard_id",
        floor(col("__exclusive").cast("double") / targetWeight.toDouble).cast("long"))
      .drop("__bucket", "__offset", "__exclusive")
  }
}
