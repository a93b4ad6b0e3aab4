package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-graph analytics (SURVEY §2.8, G1-G3) as deterministic
  * DataFrame iteration — no driver-side graph materialization, every
  * pass is a keyed join/aggregation, so the same code runs on a
  * 1000-executor cluster. Determinism (fixed iteration counts,
  * total-order tie-breaks) is what makes these oracle-checkable.
  */
object GraphAlgorithms {

  /** G1 — static PageRank, the classic damped formulation GraphX's
    * Pregel implements (reference params: damping 0.85,
    * protocol.py:38-40): rank⁰(v) = 1.0;
    * rankᵗ⁺¹(v) = (1−d) + d·Σ_{(u,v)∈E} rankᵗ(u)/outdeg(u).
    * Fixed `iters` so the result is exactly reproducible (convergence
    * thresholds are not, across engines). Edges: (src, dst), distinct.
    * Output: (node, pagerank).
    *
    * Scale: each iteration is one shuffle on dst; the rank table is
    * checkpointed per wave to keep lineage flat. 100 TB graphs: the
    * contribution join partitions by src — co-partition edges by src
    * at write time and the join is shuffle-free.
    */
  def pageRank(edges: DataFrame, iters: Int = 20, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_sum"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
        .localCheckpoint()
      ranks.unpersist(blocking = false)
      ranks = next
    }
    ranks.select(col("node"), col("rank").as("pagerank"))
  }

  /** G2 — exact betweenness centrality (Brandes), parallelized over
    * SOURCES instead of per-source sequential BFS: the state is keyed by
    * (root, node), so all |V| single-source computations advance in the
    * same DataFrame wave — the Spark-native shape of Brandes.
    *
    * Forward: BFS waves accumulate dist(root,v) and σ(root,v) (number of
    * shortest paths). Backward: for d = maxDepth..1,
    * δ(root,v) += Σ_{w: succ} σ(v)/σ(w)·(1+δ(w)).
    * betweenness(v) = Σ_root δ(root,v); normalized by (n−1)(n−2)
    * (directed, matching networkx normalized=True, protocol.py:42).
    * Output: (node, betweenness).
    *
    * Exact Brandes is O(V·E) — fine at test scale; at 100 TB sample
    * pivot roots (pass a `roots` subset) — the algorithm is unchanged.
    */
  def betweenness(edges: DataFrame, rootsOpt: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    val roots = rootsOpt.getOrElse(nodes.select(col("node").as("root")))

    // ---- forward BFS with path counting ----
    // state: (root, node, dist, sigma)
    var state = roots.select(col("root"), col("root").as("node"))
      .withColumn("dist", lit(0)).withColumn("sigma", lit(1.0))
      .localCheckpoint()
    var frontier = state
    var d = 0
    var done = false
    while (!done) {
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("root"), e("dst").as("node"), col("sigma"))
        .groupBy(col("root"), col("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(state.select(col("root"), col("node")), Seq("root", "node"), "left_anti")
        .withColumn("dist", lit(d + 1))
        .select(col("root"), col("node"), col("dist"), col("sigma"))
        .localCheckpoint()
      if (next.isEmpty) { done = true; next.unpersist(blocking = false) }
      else {
        val newState = state.unionByName(next).localCheckpoint()
        state.unpersist(blocking = false)
        state = newState
        frontier = next
        d += 1
      }
    }
    val maxDist = d

    // ---- backward dependency accumulation ----
    // delta keyed by (root, node); process distances deepest-first
    var delta = state.select(col("root"), col("node"), col("dist"), col("sigma"))
      .withColumn("delta", lit(0.0))
      .localCheckpoint()
    for (dd <- maxDist to 1 by -1) {
      val succ = delta.filter(col("dist") === dd)
        .select(col("root"), col("node").as("w"), col("sigma").as("sigma_w"),
          col("delta").as("delta_w"))
      // predecessors v of w on shortest paths: dist(v) = dd-1 and (v,w) ∈ E
      val contrib = succ
        .join(e, succ("w") === e("dst"))
        .select(col("root"), e("src").as("node"), col("sigma_w"), col("delta_w"))
        .join(delta.filter(col("dist") === (dd - 1))
            .select(col("root"), col("node"), col("sigma").as("sigma_v")),
          Seq("root", "node"))
        .select(col("root"), col("node"),
          (col("sigma_v") / col("sigma_w") * (lit(1.0) + col("delta_w"))).as("c"))
        .groupBy(col("root"), col("node"))
        .agg(sum(col("c")).as("acc"))
      val newDelta = delta
        .join(contrib, Seq("root", "node"), "left")
        .select(col("root"), col("node"), col("dist"), col("sigma"),
          (col("delta") + coalesce(col("acc"), lit(0.0))).as("delta"))
        .localCheckpoint()
      delta.unpersist(blocking = false)
      delta = newDelta
    }

    val norm = if (n > 2) (n - 1).toDouble * (n - 2).toDouble else 1.0
    val bc = delta.filter(col("node") =!= col("root"))
      .groupBy(col("node"))
      .agg(sum(col("delta")).as("raw"))
    nodes.join(bc, Seq("node"), "left")
      .select(col("node"), (coalesce(col("raw"), lit(0.0)) / lit(norm)).as("betweenness"))
  }

  /** G3 — community detection by deterministic synchronous label
    * propagation: every node starts in its own community (label = id);
    * each round a node adopts the most frequent label among its
    * (undirected) neighbors, ties broken by SMALLEST label; fixed round
    * count. Deliberate deviation from the reference's Louvain
    * (protocol.py:44): Louvain's sequential modularity sweeps are
    * order-dependent and not reproducible across engines — deterministic
    * LPA is oracle-checkable and parallel; [[modularity]] scores the
    * partition so quality stays measurable. Output: (node, community).
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 5): DataFrame = {
    val dir = edges.select(col("src"), col("dst")).distinct()
    val und = dir.unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
    val nodes = und.select(col("src").as("node")).distinct().localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val neigh = und
        .join(labels, und("dst") === labels("node"))
        .select(und("src").as("node"), col("label"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("cnt").desc, col("label").asc)
      val next = neigh
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
      labels.unpersist(blocking = false)
      labels = next
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Newman modularity of a partition over the undirected simple graph:
    * Q = Σ_c (e_c/m − (deg_c/2m)²), with e_c = intra-community edges,
    * deg_c = total degree of c's nodes, m = |edges|.
    */
  def modularity(edges: DataFrame, communities: DataFrame): DataFrame = {
    val dir = edges.select(col("src"), col("dst")).distinct()
      .filter(col("src") =!= col("dst"))
    val und = dir.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    val m = und.count().toDouble
    val lab = communities.select(col("node"), col("community"))
    val withC = und
      .join(lab.select(col("node").as("a"), col("community").as("ca")), "a")
      .join(lab.select(col("node").as("b"), col("community").as("cb")), "b")
    val intra = withC.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_c"))
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val degC = deg.join(lab, "node")
      .groupBy(col("community")).agg(sum(col("deg")).as("deg_c"))
    degC.join(intra, Seq("community"), "left")
      .select(col("community"),
        (coalesce(col("e_c"), lit(0L)).cast("double") / m -
          pow(col("deg_c").cast("double") / (2.0 * m), 2.0)).as("q_part"))
      .agg(round(sum(col("q_part")), 6).as("modularity"))
  }
}
