#!/usr/bin/env python3
"""Independent replay of q_pipeline_search (driver-side oracle tool).

Recomputes the staged-search result from the reference semantics alone
(SURVEY §2: V3 hybrid + J15 merge + R2 topology boost + R5 composite
scoring), starting from the raw documents parquet — no Spark, no shared
code with the Scala engine. Used to derive + validate the pinned VALUES
oracle registered for q_pipeline_search in WriteQueries.oracle.

Usage: pipeline_replay.py <sf_dir> [--sql]
  default: print the 8 result rows as tab-separated values
  --sql:   print a DuckDB VALUES oracle for WriteQueries.oracle
"""
import sys, hashlib, struct, math, re
from decimal import Decimal, ROUND_HALF_UP
import pyarrow.parquet as pq

N, T0, DIMS = 40, 1700000000000, 16
QUERY = "key agg row scan slow fast table"
NOW = T0 + 1000000
K = 10


def embed(text):
    """MockEmbedder: sha256 -> LE float32 reinterpret -> squash -> L2 norm."""
    need = DIMS * 4
    b = hashlib.sha256(text.encode("utf-8")).digest()
    while len(b) < need:
        b += hashlib.sha256(b).digest()
    raw = []
    for i in range(DIMS):
        (f,) = struct.unpack_from("<f", b, i * 4)
        d = float(f)
        raw.append(0.0 if math.isnan(d) or math.isinf(d) else d / (abs(d) + 1.0))
    norm = math.sqrt(sum(x * x for x in raw))
    if norm == 0.0:
        return [struct.unpack("<f", struct.pack("<f", x))[0] for x in raw]
    return [struct.unpack("<f", struct.pack("<f", x / norm))[0] for x in raw]


def cosine(a, b):
    sa = 0.0
    sb = 0.0
    dot = 0.0
    for x in a:
        sa += x * x
    for y in b:
        sb += y * y
    for x, y in zip(a, b):
        dot += x * y
    if math.sqrt(sa) == 0.0 or math.sqrt(sb) == 0.0:
        return 0.0
    return dot / (math.sqrt(sa) * math.sqrt(sb))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = sorted(
        (r["doc_id"], r["text"], r["lang"])
        for r in pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
        ).to_pylist()
        if r["doc_id"] < N
    )

    # store state (same closed-form the q_write_* oracles assert)
    mems = {}  # id -> (text, created_at, expired_at, emb)
    for i, (_, text, _) in enumerate(docs):
        m = i + 1
        expired = T0 + m * 1000 if m % 4 == 3 and m < N else None
        mems[m] = (text, T0 + i * 1000, expired, embed(text))
    ent_of = {}  # lang -> ent_id, first-appearance order
    for _, _, lang in docs:
        if lang not in ent_of:
            ent_of[lang] = len(ent_of) + 1
    has_entity = set()
    for i, (_, _, lang) in enumerate(docs):
        m = i + 1
        has_entity.add((m, ent_of[lang]))
        if i % 4 == 3:  # J10 inheritance from the superseded memory
            has_entity.add((m, ent_of[docs[i - 1][2]]))

    qv = embed(QUERY)

    # V3 hybrid: fused candidates re-ranked by clamped cosine. The BM25
    # leg only adds members to the fused set; the cosine leg already
    # contains every doc (fetchK=50 > N), so ranking is cosine-only.
    cos = {m: max(0.0, cosine(mems[m][3], qv)) for m in mems}
    page = sorted(mems, key=lambda m: (-cos[m], m))[:K]
    # post-fusion expiry filter (search/vector.py:157)
    page = [m for m in page if mems[m][2] is None]

    # R2 topology boost: 0.6*min(1,log(1+deg)/log(11)) + 0.4*shared_ratio
    ent_mem_count = {}
    for m, e in has_entity:
        ent_mem_count[e] = ent_mem_count.get(e, 0) + 1
    topo = {}
    for m in mems:
        ents = [e for (mm, e) in has_entity if mm == m]
        if not ents:
            continue
        ratio = sum(1.0 for e in ents if ent_mem_count[e] > 1) / len(ents)
        topo[m] = 0.6 * min(1.0, math.log(1.0 + len(ents)) / math.log(11.0)) + 0.4 * ratio

    # R5 composite (weights types.py:71-84; recency clamped at age>=0)
    rows = []
    for m in page:
        s = cos[m] * (1.0 + 0.2 * topo.get(m, 0.0))
        age_days = max(0, NOW - mems[m][1]) / 86400000.0
        recency = math.exp(-0.01 * age_days)
        s = 0.4 * s + 0.3 * recency + 0.15 * 0.0 + 0.15 * 1.0 + 0.0 * 0.0
        rows.append((m, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:K]

    out = [
        (str(m), Decimal(repr(s)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
        for m, s in rows
    ]
    if len(sys.argv) > 2 and sys.argv[2] == "--sql":
        vals = ",\n".join(
            f"  ('{m}', {s}, 'vector', 'semantic')" for m, s in out
        )
        print(
            "SELECT * FROM (VALUES\n" + vals +
            "\n) AS t(memory_id, score, source, memory_type)"
        )
    else:
        for m, s in out:
            print(f"{m}\t{s}\tvector\tsemantic")


if __name__ == "__main__":
    main()
