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

  /** Input columns + `outCol` = the exclusive prefix sum of `weightCol`
    * in `keyCol` order — the shared two-level scan under packShards and
    * packSequences. Null weights sum as 0; `keyCol` must be unique
    * (see the packing contract above).
    */
  private def withExclusivePrefix(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      outCol: String
  ): DataFrame = {
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
      .withColumn(outCol, col("__offset") + inclusive - w0)
      .drop("__bucket", "__offset")
  }

  def packShards(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      targetWeight: Long
  ): DataFrame = {
    require(targetWeight > 0, "targetWeight must be positive")
    withExclusivePrefix(df, keyCol, weightCol, "__exclusive")
      .withColumn("shard_id",
        floor(col("__exclusive").cast("double") / targetWeight.toDouble).cast("long"))
      .drop("__exclusive")
  }

  /** Sequence packing for pretraining: concatenate the corpus token
    * stream in `keyCol` order and chunk it into fixed `seqLen`-token
    * training sequences — the "pack documents into context windows"
    * step that follows shard assignment. Unlike packShards (a doc lands
    * whole in one shard), a document here SPANS sequence boundaries:
    * each output row is one (document, sequence) slice.
    *
    * Output: input columns + `seq_id` (which sequence the slice feeds),
    * `doc_start`/`doc_end` (the token span within the document,
    * end-exclusive) and `seq_pos` (where the slice begins inside the
    * sequence). Per doc the slices tile [0, n_tokens) exactly; per
    * sequence the slices tile [0, seqLen) exactly (last sequence
    * excepted) — both properties are spec-asserted. Zero-token rows
    * emit nothing (they contribute no tokens to any sequence).
    *
    * Scale shape: the same two-level prefix sum as packShards (never a
    * global window), then a per-row explode bounded by
    * n_tokens/seqLen + 1 slices — proportional to the corpus token
    * count over seqLen, not to document count × sequence count.
    */
  def packSequences(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      seqLen: Long
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val ntok = coalesce(col(tokensCol).cast("long"), lit(0L))
    val off = col("__off")
    val L = lit(seqLen)
    withExclusivePrefix(df, keyCol, tokensCol, "__off")
      .filter(ntok > 0)
      .withColumn("seq_id",
        explode(sequence(floor(off / L), floor((off + ntok - lit(1L)) / L))))
      .withColumn("doc_start", greatest(off, col("seq_id") * L) - off)
      .withColumn("doc_end", least(off + ntok, (col("seq_id") + 1) * L) - off)
      .withColumn("seq_pos", greatest(off, col("seq_id") * L) - col("seq_id") * L)
      .drop("__off")
  }

  /** Exact-budget greedy selection: walk the corpus in `keyCol` order
    * and keep every row that still fits the `budget` of `weightCol`
    * whole (inclusive prefix sum ≤ budget; the straddling row and
    * everything after are dropped). With a quality-ordered key this is
    * the "assemble the best ≤ N-token corpus" step of a training-mix
    * spec — an exact token budget, not a rate that lands near it.
    *
    * Scale shape: the same two-level prefix sum as [[packShards]]
    * (range partition → bounded per-bucket totals → broadcast offsets +
    * per-bucket window); never a global single-partition window.
    * Output: kept rows + `budget_used` (the inclusive prefix).
    */
  def budgetSelect(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      budget: Long
  ): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    withExclusivePrefix(df, keyCol, weightCol, "__exclusive")
      .withColumn("budget_used",
        col("__exclusive") + coalesce(col(weightCol).cast("long"), lit(0L)))
      .filter(col("budget_used") <= budget)
      .drop("__exclusive")
  }
}
