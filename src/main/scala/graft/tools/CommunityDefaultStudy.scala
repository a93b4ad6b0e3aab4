package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api._
import graft.core.GraphStore
import graft.ext._
import graft.ops.GraphAlgorithms

/** Measurement behind the manager's community-partition default
  * (VERDICT r6 #1): on MANAGER-STYLE graphs — the heterogeneous
  * memory+entity graphs the add pipeline actually builds, not the dense
  * contains-graph BASELINE §7 studied — does the Louvain-grade
  * refinement ([[GraphAlgorithms.refineCommunities]], burst off) beat
  * the plain LPA partition the manager shipped as default, and how
  * close is either to the reference's sequential Louvain
  * (protocol.py:44, manager.py:1633-1642)?
  *
  * Three graph families, each built through a REAL MemoryManager (the
  * scripted-extractor add pipeline, so edge shapes — HAS_ENTITY stars,
  * RELATION chains — are exactly what production writes):
  *  - sessions:  6 disjoint 5-entity pools, 8 memories each — the
  *               "several small clusters from distinct sessions" shape
  *  - hub:       the same plus one global entity in EVERY memory — the
  *               shape LPA's label flooding is most at risk on
  *  - single:    one richly-connected 5-entity pool — the shape whose
  *               one-cluster partition is semantically RIGHT, where
  *               modularity-optimal splitting would be a regression
  *
  * For each: modularity of LPA / refined(r∈{4,8,16}, burst off+on) /
  * sequential Louvain over the same global graph, plus the
  * materialized ≥2-member ENTITY community sets (what G4 turns into
  * Community nodes, communities.py:32-200). Run:
  *   sbt -batch "runMain graft.tools.CommunityDefaultStudy"
  *
  * MEASURED OUTCOME (recorded in BASELINE §7b, drives the shipped
  * default): refined(16, burst ON) reproduces sequential Louvain
  * exactly on the sessions family (Q 0.833 vs LPA 0.703, same sets)
  * and the hub family (Q 0.603 vs LPA's flooded 0.205, same sets),
  * and approximates Louvain's split on the single-cluster family —
  * which Louvain itself splits, refuting the r6 keep-LPA rationale.
  * Separately, the 4-node single-add star exposed a tiny-graph
  * swap-oscillation in synchronous local moving → small graphs
  * (≤ communityExactMaxNodes) run [[GraphAlgorithms.louvainDriver]]
  * instead, which IS the reference algorithm.
  */
object CommunityDefaultStudy {

  // ---------------------------------------------------------------- //
  // scenario builders — REAL manager add pipeline                     //
  // ---------------------------------------------------------------- //
  private def manager(spark: SparkSession, adds: Seq[Extraction],
      config: MemoryConfig): MemoryManager = {
    var tick = 0L
    val m = new MemoryManager(
      spark, config, new GraphStore(spark),
      new MockEmbedder(16), new ScriptedExtractor(adds), new AddAllReconciler,
      clock = () => { tick += 1; 1700000000000L + tick * 1000 })
    adds.zipWithIndex.foreach { case (_, i) =>
      m.add(s"study doc $i", now = Some(1700000000000L + i * 1000L))
    }
    m
  }

  private def pool(s: Int): Seq[String] = (0 until 5).map(i => s"s${s}_e$i")

  /** one memory: 3 consecutive pool entities + chain relations. */
  private def sessionAdd(s: Int, j: Int, extra: Seq[String] = Nil): Extraction = {
    val es = pool(s)
    val picked = (0 until 3).map(o => es((j + o) % es.size)) ++ extra
    Extraction(
      facts = Seq(s"fact s$s m$j"),
      entities = picked.map(e => ExtractedEntity(e, "thing")),
      relations = picked.sliding(2).map(p =>
        ExtractedRelation(p(0), p(1), "related_to")).toSeq)
  }

  def scenarioSessions(spark: SparkSession,
      config: MemoryConfig = MemoryConfig(userId = "study")): MemoryManager =
    manager(spark,
      for (s <- 0 until 6; j <- 0 until 8) yield sessionAdd(s, j), config)

  def scenarioHub(spark: SparkSession,
      config: MemoryConfig = MemoryConfig(userId = "study")): MemoryManager =
    manager(spark,
      for (s <- 0 until 6; j <- 0 until 8)
        yield sessionAdd(s, j, extra = Seq("hub_user")), config)

  def scenarioSingle(spark: SparkSession,
      config: MemoryConfig = MemoryConfig(userId = "study")): MemoryManager =
    manager(spark, for (j <- 0 until 8) yield sessionAdd(0, j), config)

  // ---------------------------------------------------------------- //

  private val EntC = 1L // MemoryManager's label-space code for Entity

  /** ≥2-member entity community name-sets — what G4 materializes. */
  private def entitySets(mgr: MemoryManager, part: DataFrame): Seq[Set[String]] = {
    val ents = part.filter(pmod(col("node"), lit(8L)) === EntC)
      .select(((col("node") - EntC) / 8L).cast("long").as("id"), col("community"))
      .join(mgr.store.entities.select(col("id"), col("name")), "id")
      .collect().map(r => r.getLong(1) -> r.getString(2))
    ents.groupBy(_._1).values.filter(_.length >= 2)
      .map(_.map(_._2).toSet).toSeq.sortBy(s => (s.size, s.min))
  }

  private def q(edges: DataFrame, part: DataFrame): Double =
    GraphAlgorithms.modularity(edges, part).collect().head.getDouble(0)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val scenarios: Seq[(String, MemoryManager)] = Seq(
      "sessions" -> scenarioSessions(spark),
      "hub" -> scenarioHub(spark),
      "single" -> scenarioSingle(spark))

    for ((name, mgr) <- scenarios) {
      val ge = mgr.globalEdges.localCheckpoint()
      val pairs = ge.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val lpa = GraphAlgorithms.labelPropagation(ge).localCheckpoint()
      val louv = GraphAlgorithms.louvainSequential(pairs).toSeq
        .toDF("node", "community")
      println(s"== scenario $name: ${pairs.size} edges, " +
        s"${mgr.store.entities.count()} entities ==")
      println(f"  louvain(seq)  Q=${q(ge, louv)}%.6f  " +
        s"entitySets=${entitySets(mgr, louv)}")
      println(f"  lpa(5)        Q=${q(ge, lpa)}%.6f  " +
        s"entitySets=${entitySets(mgr, lpa)}")
      for (r <- Seq(4, 8, 16); burst <- Seq(false, true)) {
        val ref = GraphAlgorithms.refineCommunities(ge, lpa, rounds = r,
          burstMajoritySeed = burst)
        val tag = if (burst) "burst" else "     "
        println(f"  refined($r%2d,$tag) Q=${q(ge, ref)}%.6f  " +
          s"entitySets=${entitySets(mgr, ref)}")
      }
    }
    spark.stop()
  }
}
