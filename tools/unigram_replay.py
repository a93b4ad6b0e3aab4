#!/usr/bin/env python3
"""Independent replay of q_unigram_encode (driver-side oracle tool).

Viterbi-encodes the pinned document subset (doc_id % 7 = 0) with the
FROZEN unigram model in tools/unigram_model.json, implementing the
documented kernel semantics from scratch (no Scala code shared):

  - tokens: lowercase, split on non-[a-z0-9] runs, drop empties
  - per token: DP over code-point boundaries maximizing summed piece
    logps; candidate start positions scanned longest-piece-first with
    strictly-greater replacement (exact ties keep the longer trailing
    piece); a position no piece reaches falls back to a single-char
    piece at logp -100.0
  - output per doc: n_pieces, first 16 pieces joined by ' ', and the
    md5 of ALL pieces joined by ' ' (full-sequence coverage with a
    diagnosable head)

Used to derive + validate the pinned VALUES oracle registered for
q_unigram_encode in TextQueries.oracle.

Usage: unigram_replay.py <sf_dir> [--sql]
  default: tab-separated rows
  --sql:   DuckDB VALUES oracle for TextQueries.oracle
"""
import hashlib
import json
import os
import re
import sys

import pyarrow.parquet as pq

UNK_LOGP = -100.0
HEAD_N = 16


def tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def viterbi(word, lp, max_len):
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == float("-inf"):
                continue
            p = lp.get(word[j:i])
            if p is not None and best[j] + p > best[i]:
                best[i] = best[j] + p
                back[i] = j
        if best[i] == float("-inf"):
            best[i] = best[i - 1] + UNK_LOGP
            back[i] = i - 1
    out = []
    cur = n
    while cur > 0:
        out.append(word[back[cur]:cur])
        cur = back[cur]
    out.reverse()
    return out


def main():
    sf_dir = sys.argv[1]
    as_sql = "--sql" in sys.argv
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "unigram_model.json")) as f:
        model = json.load(f)
    lp = {p: float(v) for p, v in model}
    max_len = max(len(p) for p in lp)

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in sorted(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())):
        if doc_id % 7 != 0:
            continue
        pieces = []
        for w in tokens(text or ""):
            pieces.extend(viterbi(w, lp, max_len))
        joined = " ".join(pieces)
        rows.append((doc_id, len(pieces), " ".join(pieces[:HEAD_N]),
                     hashlib.md5(joined.encode("utf-8")).hexdigest()))

    if as_sql:
        print("SELECT doc_id::BIGINT AS doc_id, n_pieces::BIGINT AS n_pieces,")
        print("  head_pieces, pieces_md5")
        print("FROM (VALUES")
        body = ",\n".join(
            f"  ({d}, {n}, '{h}', '{m}')" for d, n, h, m in rows
        )
        print(body)
        print(") AS t(doc_id, n_pieces, head_pieces, pieces_md5)")
        print("ORDER BY doc_id")
    else:
        for r in rows:
            print("\t".join(map(str, r)))


if __name__ == "__main__":
    main()
