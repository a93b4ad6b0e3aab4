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

  /** One packing-recipe row: docs of length `len` with per-length rank
    * i in [rankStart, rankStart + count) land in
    * bin = binStart + (i − rankStart) div perBin at
    * slot = slotBase + (i − rankStart) mod perBin — i.e. `perBin`
    * consecutive ranks fill one bin before moving to the next, exactly
    * the order sequential best-fit visits them.
    */
  private[ops] case class RecipeRow(
      len: Long, rankStart: Long, count: Long, binStart: Long,
      slotBase: Int, perBin: Long)

  /** Histogram best-fit-decreasing solver (the driver-side half of
    * [[packBins]]): operates on the LENGTH HISTOGRAM, never on rows.
    * Bins are tracked as residual-capacity classes holding CONTIGUOUS
    * id ranges of bins with identical packing history (equal residual
    * AND equal doc count), consumed FIFO — which makes the per-doc
    * assignment a closed-form (rank → bin, slot) recipe instead of a
    * per-bin table.
    *
    * Semantics = SEQUENTIAL best fit over docs sorted (len desc, rank
    * asc): each doc goes to the bin with the smallest adequate
    * residual; within a class, to the bin that entered it earliest
    * (FIFO), lowest id first. A just-filled bin that remains adequate
    * is therefore refilled immediately (it owns the new smallest
    * residual), so a bin takes t = floor(r / len) consecutive docs
    * before the walk moves on — the step below models whole chunks of
    * that pattern at once (OpsSpec pins equality with an independent
    * doc-by-doc simulator). Returns (recipe, binCount).
    */
  private[ops] def solveRecipe(
      hist: Seq[(Long, Long)],
      seqLen: Long): (Seq[RecipeRow], Long) = {
    import scala.collection.mutable
    final case class Chunk(binStart: Long, count: Long, docsInBin: Int)
    val classes = mutable.TreeMap.empty[Long, mutable.ArrayDeque[Chunk]]
    var nextBin = 0L
    val recipe = mutable.ArrayBuffer.empty[RecipeRow]
    for ((len, cnt) <- hist.sortBy { case (l, _) => -l }) {
      require(len >= 1 && len <= seqLen,
        s"doc length $len outside [1, $seqLen] — chunk longer docs first")
      var remaining = cnt
      var placed = 0L
      def settle(binStart: Long, k: Long, t: Long, r: Long, d: Int): Unit = {
        // k docs went into bins binStart.., t per full bin: f full bins
        // land in class r − t·len, a trailing partial bin (j docs) in
        // class r − j·len; both enter their class now (FIFO append)
        val f = k / t; val j = k % t
        if (f > 0)
          classes.getOrElseUpdate(r - t * len, mutable.ArrayDeque.empty)
            .append(Chunk(binStart, f, d + t.toInt))
        if (j > 0)
          classes.getOrElseUpdate(r - j * len, mutable.ArrayDeque.empty)
            .append(Chunk(binStart + f, 1, d + j.toInt))
      }
      while (remaining > 0) {
        val fit = classes.iteratorFrom(len)
          .collectFirst { case (r, q) if q.nonEmpty => r }
        fit match {
          case Some(r) =>
            val q = classes(r)
            val chunk = q.head
            val t = r / len // docs a residual-r bin absorbs back-to-back
            val k = math.min(remaining, chunk.count * t)
            val binsUsed = (k + t - 1) / t
            recipe += RecipeRow(len, placed, k, chunk.binStart,
              chunk.docsInBin, t)
            if (binsUsed == chunk.count) q.removeHead()
            else q(0) = Chunk(chunk.binStart + binsUsed,
              chunk.count - binsUsed, chunk.docsInBin)
            settle(chunk.binStart, k, t, r, chunk.docsInBin)
            remaining -= k; placed += k
          case None =>
            val t = seqLen / len
            val k = remaining
            recipe += RecipeRow(len, placed, k, nextBin, 0, t)
            settle(nextBin, k, t, seqLen, 0)
            nextBin += (k + t - 1) / t
            placed += k; remaining = 0
        }
      }
    }
    (recipe.toSeq, nextBin)
  }

  /** NO-SPLIT sequence packing — histogram best-fit-decreasing (the
    * shape of Krell et al. 2021's histogram packing for LLM batching):
    * every document stays whole, bins have capacity `seqLen` tokens,
    * and the goal is minimal padding. The complement of
    * [[packSequences]] (which concatenates and splits mid-doc — right
    * for plain pretraining, wrong when examples must not cross
    * boundaries, e.g. instruction tuning).
    *
    * Why this scales: the bin-packing decision runs on the length
    * HISTOGRAM (≤ seqLen rows — lengths are bounded by capacity), so
    * the driver solve is O(seqLen·classes) regardless of corpus size,
    * and it emits a RECIPE of contiguous rank→bin ranges (bins that
    * pack identically occupy contiguous ids). Row assignment is then:
    * per-length rank (two-level: range-bucketed counts + within-bucket
    * window — never a per-length global window) + one broadcast
    * equi-join on length against the recipe. Zero data-keyed shuffles
    * beyond the rank's range partition.
    *
    * Deterministic: ranks order by (len, keyCol), the solver is
    * sequential over the sorted histogram, and the FIFO/lowest-id tie
    * rule fixes every assignment — any cluster layout produces the
    * same (bin_id, bin_slot) for every doc (spec-asserted, along with
    * equality to an independent doc-by-doc best-fit simulator).
    *
    * Not DuckDB-oracle-gated: the solver is a data-dependent loop (no
    * fixed unroll), the TokenizerSpec/unigram precedent — the gate is
    * the independent-reference equality + invariants in OpsSpec and
    * the q_pack_bins bench row.
    *
    * Output: input columns + `n_tok`, `bin_id` (0-based, dense),
    * `bin_slot` (0-based position within the bin).
    */
  def packBins(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      seqLen: Long
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    val ntok = coalesce(col(tokensCol).cast("long"), lit(0L))
    val ranged = df.filter(ntok > 0)
      .withColumn("__len", ntok)
      .repartitionByRange(p, col("__len"), col(keyCol))
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint() // pin bucket ids between the counts pass and the window
    // bounded collect: ≤ (buckets + distinct lengths) rows — a length
    // spans at most one partial bucket on each side of its range
    val counts = ranged.groupBy(col("__len"), col("__bucket"))
      .agg(count(lit(1)).as("__c")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    if (counts.isEmpty) {
      return ranged.drop("__len", "__bucket")
        .withColumn("n_tok", lit(0L))
        .withColumn("bin_id", lit(0L)).withColumn("bin_slot", lit(0))
        .limit(0)
    }
    val offsets = counts.groupBy(_._1).toSeq.flatMap { case (_, cs) =>
      var acc = 0L
      cs.sortBy(_._2).map { case (l, b, c) => val o = (l, b, acc); acc += c; o }
    }
    val hist = counts.groupBy(_._1).toSeq
      .map { case (l, cs) => (l, cs.map(_._3).sum) }
    val (recipe, _) = solveRecipe(hist, seqLen)
    val offDf = offsets.toDF("__len", "__bucket", "__loff")
    val recDf = recipe
      .map(r => (r.len, r.rankStart, r.count, r.binStart, r.slotBase, r.perBin))
      .toDF("__len", "__rs", "__rc", "__bs", "__sb", "__pb")
    val w = Window.partitionBy(col("__len"), col("__bucket")).orderBy(col(keyCol))
    ranged
      .join(broadcast(offDf), Seq("__len", "__bucket"))
      .withColumn("__rank", col("__loff") + row_number().over(w) - 1)
      .join(broadcast(recDf), Seq("__len"))
      .filter(col("__rank") >= col("__rs") &&
        col("__rank") < col("__rs") + col("__rc"))
      .withColumn("__i", col("__rank") - col("__rs"))
      .withColumn("n_tok", col("__len"))
      .withColumn("bin_id", col("__bs") + expr("__i div __pb"))
      .withColumn("bin_slot",
        (col("__sb") + pmod(col("__i"), col("__pb"))).cast("int"))
      .drop("__len", "__bucket", "__loff", "__rank", "__rs", "__rc",
        "__bs", "__sb", "__pb", "__i")
  }
}
