#!/usr/bin/env python3
"""Louvain-quality measurement (VERDICT r5 task #6) — OFFLINE, test-only.

The reference runs real Louvain at resolution=1.0 for community
detection (grafeo-memory protocol.py:44, manager.py:1633-1642); the
Spark engine ships deterministic 5-round LPA + modularity instead
(graft.ops.GraphAlgorithms). This script measures the quality delta on
the exact graph q_communities runs on at sf0.01: the undirected,
deduplicated (l_orderkey, l_partkey) contains-graph.

Pure-Python Louvain (networkx is not in this container): standard
two-phase heuristic — local moving to the neighboring community with
max modularity gain, then graph aggregation — iterated to a fixpoint,
deterministic (sorted node order, lowest-community tie-break).

LPA partition comes from the same recursive-CTE SQL the DuckDB oracle
uses for q_communities, so this measures the shipped semantics, not a
re-implementation. Modularity for both partitions is computed by one
shared function (unweighted at level 0) matching
GraphAlgorithms.modularity and the q_modularity oracle.

Usage: python3 tools/louvain_quality.py [sf_dir]
"""
import sys
from collections import defaultdict

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
LPA_ROUNDS = 5
RESOLUTION = 1.0  # reference default, manager.py:1634


def load_graph(con):
    """Undirected dedup edges of the contains-graph (same CTE as the
    q_modularity oracle: least/greatest distinct, self-loops dropped)."""
    rows = con.execute(f"""
        WITH dir AS (SELECT DISTINCT l_orderkey AS src, l_partkey AS dst
                     FROM read_parquet('{SF_DIR}/lineitem.parquet'))
        SELECT least(src, dst) AS a, greatest(src, dst) AS b
        FROM dir WHERE src <> dst GROUP BY 1, 2
    """).fetchall()
    return rows


def lpa_partition(con):
    """The shipped LPA semantics via the oracle's recursive CTE."""
    rows = con.execute(f"""
        WITH RECURSIVE
        dir AS (SELECT DISTINCT l_orderkey AS src, l_partkey AS dst
                FROM read_parquet('{SF_DIR}/lineitem.parquet')),
        und AS (SELECT src, dst FROM (
          SELECT src, dst FROM dir UNION SELECT dst AS src, src AS dst FROM dir)
          WHERE src <> dst),
        lp AS (
          SELECT src AS node, src AS label, 0 AS it FROM (SELECT DISTINCT src FROM und)
          UNION ALL
          SELECT node, label, it FROM (
            SELECT u.src AS node, lp.label AS label, max(lp.it) + 1 AS it,
              row_number() OVER (PARTITION BY u.src ORDER BY count(*) DESC, lp.label ASC) AS rn
            FROM und u JOIN lp ON u.dst = lp.node
            GROUP BY u.src, lp.label)
          WHERE rn = 1 AND it <= {LPA_ROUNDS})
        SELECT node, label AS community FROM lp WHERE it = {LPA_ROUNDS}
    """).fetchall()
    return dict(rows)


def modularity(edges, part, resolution=1.0):
    """Q = sum_c [ e_c/m - gamma * (deg_c / 2m)^2 ], unweighted."""
    m = len(edges)
    deg = defaultdict(int)
    intra = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        if part[a] == part[b]:
            intra[part[a]] += 1
    deg_c = defaultdict(int)
    for n, d in deg.items():
        deg_c[part[n]] += d
    return sum(intra[c] / m - resolution * (dc / (2.0 * m)) ** 2
               for c, dc in deg_c.items())


def louvain(edges, resolution=1.0, max_levels=20):
    """Deterministic Louvain. Returns node -> community (original ids)."""
    # current-level weighted graph: adjacency with edge weights + self-loops
    nodes = sorted({n for e in edges for n in e})
    part = {n: n for n in nodes}            # original node -> community
    # level graph: node -> {nbr: weight}; self-loop weight stored separately
    adj = defaultdict(lambda: defaultdict(float))
    loops = defaultdict(float)
    for a, b in edges:
        adj[a][b] += 1.0
        adj[b][a] += 1.0
    m2 = 2.0 * len(edges)                   # sum of all degrees, constant

    level_of = {n: n for n in nodes}        # original -> current-level node
    for _level in range(max_levels):
        lnodes = sorted(adj.keys() | loops.keys())
        # degrees include self-loop weight twice (standard convention)
        k = {n: sum(adj[n].values()) + 2.0 * loops[n] for n in lnodes}
        comm = {n: n for n in lnodes}
        sigma_tot = defaultdict(float)      # sum of degrees per community
        for n in lnodes:
            sigma_tot[n] = k[n]
        improved_any = False
        moved = True
        while moved:
            moved = False
            for n in lnodes:
                c_old = comm[n]
                # weight from n to each neighboring community
                w_to = defaultdict(float)
                for nbr, w in adj[n].items():
                    if nbr != n:
                        w_to[comm[nbr]] += w
                sigma_tot[c_old] -= k[n]
                # gain of joining c: w_to[c] - gamma * sigma_tot[c]*k[n]/2m
                best_c, best_gain = c_old, w_to.get(c_old, 0.0) - \
                    resolution * sigma_tot[c_old] * k[n] / m2
                for c, w in sorted(w_to.items()):
                    gain = w - resolution * sigma_tot[c] * k[n] / m2
                    if gain > best_gain + 1e-12 or \
                       (abs(gain - best_gain) <= 1e-12 and c < best_c):
                        best_c, best_gain = c, gain
                sigma_tot[best_c] += k[n]
                if best_c != c_old:
                    comm[n] = best_c
                    moved = True
                    improved_any = True
        if not improved_any:
            break
        # aggregate: communities become nodes
        for orig in level_of:
            level_of[orig] = comm[level_of[orig]]
        new_adj = defaultdict(lambda: defaultdict(float))
        new_loops = defaultdict(float)
        for n in lnodes:
            cn = comm[n]
            new_loops[cn] += loops[n]
            for nbr, w in adj[n].items():
                cb = comm[nbr]
                if cn == cb:
                    if n < nbr:
                        new_loops[cn] += w
                else:
                    new_adj[cn][cb] += w
        adj, loops = new_adj, new_loops
    for orig in part:
        part[orig] = level_of[orig]
    return part


def refined_partition(edges, seed, rounds=16, classes=4):
    """Sequential replay of the SHIPPED GraphAlgorithms.refineCommunities
    semantics: majority-seed burst, mod-`classes` residue schedule,
    exact integer gains, strict-improvement moves, smallest-c ties."""
    m = len(edges)
    deg = defaultdict(int)
    adj = defaultdict(list)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        adj[a].append(b)
        adj[b].append(a)
    nodes = set(deg)
    n = len(nodes)
    sizes = defaultdict(int)
    for nd in nodes:
        sizes[seed[nd]] += 1
    part = {nd: (nd if 2 * sizes[seed[nd]] > n else seed[nd]) for nd in nodes}
    for r in range(rounds):
        sigma = defaultdict(int)
        for nd, c in part.items():
            sigma[c] += deg[nd]
        new = dict(part)
        for nd in nodes:
            if nd % classes != r % classes:
                continue
            cn = part[nd]
            w = defaultdict(int)
            for nb in adj[nd]:
                w[part[nb]] += 1
            g_stay = 2 * m * w.get(cn, 0) - deg[nd] * (sigma[cn] - deg[nd])
            bc, bg = cn, g_stay
            for c in sorted(w):
                if c == cn:
                    continue
                g = 2 * m * w[c] - deg[nd] * sigma[c]
                if g > bg or (g == bg and bc != cn and c < bc):
                    bc, bg = c, g
            if bg > g_stay:
                new[nd] = bc
        part = new
    return part


def main():
    con = duckdb.connect()
    edges = load_graph(con)
    nodes = {n for e in edges for n in e}
    print(f"graph: {len(nodes)} nodes, {len(edges)} undirected edges "
          f"({SF_DIR})")

    lpa = lpa_partition(con)
    q_lpa = modularity(edges, lpa, RESOLUTION)
    n_lpa = len(set(lpa.values()))
    print(f"LPA({LPA_ROUNDS} rounds, shipped): modularity={q_lpa:.6f} "
          f"communities={n_lpa}")

    ref = refined_partition(edges, lpa)
    q_ref = modularity(edges, ref, RESOLUTION)
    print(f"refined (shipped mod-4 x 16 replay): modularity={q_ref:.6f} "
          f"communities={len(set(ref.values()))}")

    lv = louvain(edges, RESOLUTION)
    q_lv = modularity(edges, lv, RESOLUTION)
    n_lv = len(set(lv.values()))
    print(f"Louvain(res={RESOLUTION}, reference-style): "
          f"modularity={q_lv:.6f} communities={n_lv}")
    print(f"delta: refined - Louvain = {q_ref - q_lv:+.6f} "
          f"({q_ref / max(q_lv, 1e-12) * 100:.1f}% of Louvain)")


if __name__ == "__main__":
    main()
