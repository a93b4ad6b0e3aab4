package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-backed labeled-property-graph store (SURVEY §1, S1-S9).
  *
  * One DataFrame per label plus a single typed edge table. Mutations are
  * the three Spark-native write shapes:
  *   - append       = `unionByName` of a small new-rows DataFrame,
  *   - upsert/patch = broadcast left-join MERGE (patch rows win on the
  *                    patched columns, base rows pass through),
  *   - delete       = `left_anti` join on the id set.
  * Lineage is truncated with an eager `localCheckpoint` every
  * `checkpointEvery` mutations so a long-lived session stays flat. At
  * warehouse scale the same three shapes write Parquet partitions
  * (persist/load below); the in-session DataFrames are the hot state.
  *
  * Ids are per-label sequences (reference ids are engine-global,
  * protocol.py:17-27; per-label spaces are equivalent here because every
  * edge type fixes its endpoint labels — SURVEY §1.3 — and they keep
  * oracle SQL closed-form).
  */
final class GraphStore(val spark: SparkSession, checkpointEvery: Int = 16) {

  import spark.implicits._

  // @volatile: mutators run store-synchronized, but readers (search,
  // candidate scans) read these refs lock-free from other threads — the
  // volatile store gives them the happens-before edge to see fresh state
  @volatile var memories: DataFrame = spark.emptyDataset[MemoryRow].toDF()
  @volatile var entities: DataFrame = spark.emptyDataset[EntityRow].toDF()
  @volatile var episodes: DataFrame = spark.emptyDataset[EpisodeRow].toDF()
  @volatile var communities: DataFrame = spark.emptyDataset[CommunityRow].toDF()
  @volatile var history: DataFrame = spark.emptyDataset[HistoryRow].toDF()
  @volatile var edges: DataFrame = spark.emptyDataset[EdgeRow].toDF()

  private val memoryIds = new AtomicLong(0)
  private val entityIds = new AtomicLong(0)
  private val episodeIds = new AtomicLong(0)
  private val communityIds = new AtomicLong(0)
  private val historyIds = new AtomicLong(0)
  private val edgeIds = new AtomicLong(0)

  def nextMemoryId(): Long = memoryIds.incrementAndGet()
  def nextEntityId(): Long = entityIds.incrementAndGet()
  def nextEpisodeId(): Long = episodeIds.incrementAndGet()
  def nextCommunityId(): Long = communityIds.incrementAndGet()
  def nextHistoryId(): Long = historyIds.incrementAndGet()
  def nextEdgeId(): Long = edgeIds.incrementAndGet()

  private var mutations = 0
  /** Write-version: every mutation. Graph-version: only mutations that
    * change edge topology (edge appends, node/edge deletes) — the
    * whole-graph-metrics dirty flag reads THIS one, so access-count
    * bumps and property patches don't retrigger PageRank/betweenness.
    */
  @volatile private var version = 0L
  @volatile private var graphVer = 0L
  // importance-version: ticked only by mutations that can change a
  // memory's importance column — the one input to reinforcement-style
  // metrics that neither writeVersion (too chatty: access bumps) nor
  // graphVersion (edge-only) tracks
  @volatile private var importanceVer = 0L
  // text-version: ticked by mutations that change the (id, text) row
  // set — memory appends/deletes/loads and text patches — the inputs of
  // text-index-shaped state (BM25 prepared corpus); access bumps and
  // expiry/metric patches do NOT tick it
  @volatile private var textVer = 0L
  def writeVersion: Long = version
  def graphVersion: Long = graphVer
  def importanceVersion: Long = importanceVer
  def textVersion: Long = textVer

  /** Driver-appended rows arrive SIZE-SLICED (r15, guide §2/§6):
    * `createDataset` of an in-process list parallelizes to
    * defaultParallelism slices regardless of size, so a store grown by
    * chunked appends accumulated 32 near-empty partitions PER APPEND —
    * a 5000-row sf0.1 store reached 160-partition tables and every
    * search stage scheduled ~90 tasks to scan 5000 rows (the
    * q_pipeline_search_scaled dispatch-overhead exhibit: 8 cores beat
    * 32 by 3.4×). One slice per ~256 rows (capped at
    * defaultParallelism) keeps single-row adds at one partition while a
    * bulk chunk still re-executes its downstream lineage (per-add
    * patches, candidate scans) with real parallelism — a constant 1
    * was measured to serialize q_write_reconcile's per-add lineage
    * (5.6 → 8.8 s). Append batches are driver-small by the API
    * contract; [[boundParts]] bounds the accumulated union at
    * checkpoint time.
    */
  private def newRows[T](ds: org.apache.spark.sql.Dataset[T],
      n: Int): DataFrame =
    ds.toDF().coalesce(math.max(1,
      math.min(spark.sparkContext.defaultParallelism, n / 256)))

  /** Partition bound applied when the periodic checkpoint materializes
    * a table: long-lived sessions accumulate one partition per append
    * (plus the loaded base's), so cap at 2× defaultParallelism and
    * coalesce (narrow, no shuffle) back to defaultParallelism. The
    * in-session store is the documented driver-small hot state — the
    * warehouse-scale path writes parquet partitions instead.
    */
  private def boundParts(df: DataFrame): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions > 2 * par) df.coalesce(par) else df
  }

  private def tick(structural: Boolean = false): Unit = {
    version += 1
    if (structural) graphVer += 1
    mutations += 1
    if (mutations % checkpointEvery == 0) {
      memories = boundParts(memories).localCheckpoint()
      entities = boundParts(entities).localCheckpoint()
      episodes = boundParts(episodes).localCheckpoint()
      communities = boundParts(communities).localCheckpoint()
      history = boundParts(history).localCheckpoint()
      edges = boundParts(edges).localCheckpoint()
    }
  }

  // ---- appends (S4/S5) ----

  def appendMemories(rows: Seq[MemoryRow]): Unit = this.synchronized {
    if (rows.nonEmpty) {
      memories = memories.unionByName(newRows(spark.createDataset(rows), rows.size))
      importanceVer += 1
      textVer += 1
      tick()
    }
  }
  def appendEntities(rows: Seq[EntityRow]): Unit = this.synchronized {
    if (rows.nonEmpty) {
      entities = entities.unionByName(newRows(spark.createDataset(rows), rows.size))
      tick()
    }
  }
  def appendEpisodes(rows: Seq[EpisodeRow]): Unit = this.synchronized {
    if (rows.nonEmpty) {
      episodes = episodes.unionByName(newRows(spark.createDataset(rows), rows.size))
      tick()
    }
  }
  def appendCommunities(rows: Seq[CommunityRow]): Unit = this.synchronized {
    if (rows.nonEmpty) {
      communities = communities.unionByName(newRows(spark.createDataset(rows), rows.size))
      tick()
    }
  }
  def appendHistory(rows: Seq[HistoryRow]): Unit = this.synchronized {
    if (rows.nonEmpty) {
      history = history.unionByName(newRows(spark.createDataset(rows), rows.size))
      tick()
    }
  }
  def appendEdges(rows: Seq[EdgeRow]): Unit = this.synchronized {
    if (rows.nonEmpty) {
      edges = edges.unionByName(newRows(spark.createDataset(rows), rows.size))
      tick(structural = true)
    }
  }

  // ---- patch / upsert (S6, W2/W4/W6/W12) ----

  /** Broadcast-MERGE: rows of `patch` (must carry `id` + the columns in
    * `setCols` with the memories schema's types) overwrite those columns
    * for matching ids; everything else passes through unchanged.
    */
  def patchMemories(patch: DataFrame, setCols: Seq[String]): Unit = this.synchronized {
    if (setCols.contains("importance")) importanceVer += 1
    if (setCols.contains("text")) textVer += 1
    val p = broadcast(
      patch.select(
        (col("id").as("__pid") +: setCols.map(c => col(c).as(s"__p_$c"))): _*))
    val merged = memories
      .join(p, memories("id") === p("__pid"), "left")
      .select(memories.columns.map { c =>
        if (setCols.contains(c))
          when(col("__pid").isNotNull, col(s"__p_$c")).otherwise(memories(c)).as(c)
        else memories(c)
      }: _*)
    memories = merged
    tick()
  }

  /** R5 side effect — access_count += 1, last_accessed = now for the
    * given ids (scoring.py:117-122), as one batched MERGE.
    */
  def bumpAccess(ids: Seq[Long], nowMs: Long): Unit = this.synchronized {
    if (ids.nonEmpty) {
      val idSet = ids.toSet.toSeq
      memories = memories
        .withColumn(
          "access_count",
          when(col("id").isin(idSet: _*), coalesce(col("access_count"), lit(0L)) + 1L)
            .otherwise(col("access_count")))
        .withColumn(
          "last_accessed",
          when(col("id").isin(idSet: _*), lit(nowMs)).otherwise(col("last_accessed")))
      tick()
    }
  }

  // ---- deletes (S7, W5) ----

  def deleteMemories(ids: Seq[Long]): Unit = this.synchronized {
    if (ids.nonEmpty) {
      val d = ids.toDF("__did")
      memories = memories.join(d, memories("id") === col("__did"), "left_anti")
      // cascade: edges whose MEMORY endpoint was deleted disappear with
      // it. Ids are per-label sequences (they overlap across labels!),
      // so each edge type must match ONLY the endpoint that is a Memory:
      // HAS_ENTITY/HAS_HISTORY src, PRODUCED dst, SUPERSEDES/LEADS_TO
      // both ends — a both-ends match on HAS_ENTITY would also delete
      // entity-N's links whenever memory-N dies. DERIVED_FROM is
      // deliberately NOT cascaded: consolidation (W7) creates provenance
      // edges to originals it then hard-deletes (manager.py:1905-1912) —
      // the tombstone reference is the provenance record.
      val idSet = ids.toSet.toSeq
      val srcDead = col("src").isin(idSet: _*)
      val dstDead = col("dst").isin(idSet: _*)
      val dead =
        (col("edge_type").isin(EdgeTypes.HasEntity, EdgeTypes.HasHistory) && srcDead) ||
        (col("edge_type") === EdgeTypes.Produced && dstDead) ||
        (col("edge_type").isin(EdgeTypes.Supersedes, EdgeTypes.LeadsTo) &&
          (srcDead || dstDead))
      edges = edges.filter(!dead)
      importanceVer += 1
      textVer += 1
      tick(structural = true)
    }
  }

  /** Deletes every memory matching `pred` WITHOUT materializing ids on
    * the driver (A10 delete_all — the reference loops get-all→delete,
    * manager.py:2200-2207; SURVEY §4 says don't copy that). The matched
    * id set stays a DataFrame: one localCheckpoint + one count() for the
    * returned delta, then the same anti-join delete + endpoint-typed edge
    * cascade as [[deleteMemories]] via joins against the id frame — no
    * `isin` literal list, so a tenant with 10^9 scoped rows deletes in
    * one distributed pass.
    */
  def deleteMemoriesWhere(pred: org.apache.spark.sql.Column): Long =
    this.synchronized {
      val doomed = memories.filter(pred).select(col("id").as("__did"))
        .localCheckpoint()
      val n = doomed.count()
      if (n > 0) {
        memories = memories.join(doomed, memories("id") === col("__did"), "left_anti")
        // cascade with the same endpoint-type discipline as deleteMemories
        // (ids are per-label sequences — only Memory endpoints may match)
        val dSrc = doomed.withColumnRenamed("__did", "__dsrc")
        val dDst = doomed.withColumnRenamed("__did", "__ddst")
        val marked = edges
          .join(dSrc, edges("src") === col("__dsrc"), "left")
          .join(dDst, edges("dst") === col("__ddst"), "left")
        val srcDead = col("__dsrc").isNotNull
        val dstDead = col("__ddst").isNotNull
        val dead =
          (col("edge_type").isin(EdgeTypes.HasEntity, EdgeTypes.HasHistory) && srcDead) ||
          (col("edge_type") === EdgeTypes.Produced && dstDead) ||
          (col("edge_type").isin(EdgeTypes.Supersedes, EdgeTypes.LeadsTo) &&
            (srcDead || dstDead))
        edges = marked.filter(!dead).drop("__dsrc", "__ddst")
        importanceVer += 1
        textVer += 1
        tick(structural = true)
      }
      n
    }

  def deleteEdgesById(ids: Seq[Long]): Unit = this.synchronized {
    if (ids.nonEmpty) {
      edges = edges.filter(!col("edge_id").isin(ids.toSet.toSeq: _*))
      tick(structural = true)
    }
  }

  def deleteCommunities(ids: Seq[Long]): Unit = this.synchronized {
    if (ids.nonEmpty) {
      val idSet = ids.toSet.toSeq
      communities = communities.filter(!col("id").isin(idSet: _*))
      edges = edges.filter(
        !(col("edge_type") === EdgeTypes.HasMember && col("src").isin(idSet: _*)))
      tick(structural = true)
    }
  }

  // ---- persistence (S8) ----

  def persist(dir: String): Unit = this.synchronized {
    // memories are partitioned by a user bucket so the F1 scope filter
    // prunes partitions at the parquet scan — at warehouse scale a
    // single-tenant read touches 1/64th of the files (user_id itself
    // would explode the partition count at millions of tenants).
    // A 0-row partitioned write emits no schema-bearing files and the
    // read-back fails UNABLE_TO_INFER_SCHEMA — write flat when empty.
    val mem = memories.withColumn("user_bucket", pmod(crc32(col("user_id")), lit(64)))
    if (memories.isEmpty)
      mem.write.mode("overwrite").parquet(s"$dir/memories")
    else
      mem.write.mode("overwrite").partitionBy("user_bucket").parquet(s"$dir/memories")
    val tables = Seq(
      "entities" -> entities, "episodes" -> episodes,
      "communities" -> communities, "history" -> history, "edges" -> edges)
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n")
    }
  }

  def load(dir: String): Unit = this.synchronized {
    def rd(n: String): DataFrame = spark.read.parquet(s"$dir/$n")
    memories = rd("memories").drop("user_bucket")
    entities = rd("entities")
    episodes = rd("episodes"); communities = rd("communities")
    history = rd("history"); edges = rd("edges")
    def maxId(df: DataFrame, c: String): Long =
      if (df.isEmpty) 0L
      else df.agg(max(col(c))).head().getLong(0)
    memoryIds.set(maxId(memories, "id")); entityIds.set(maxId(entities, "id"))
    episodeIds.set(maxId(episodes, "id")); communityIds.set(maxId(communities, "id"))
    historyIds.set(maxId(history, "id")); edgeIds.set(maxId(edges, "edge_id"))
    importanceVer += 1
    textVer += 1
    tick(structural = true) // the whole edge table changed
  }
}
