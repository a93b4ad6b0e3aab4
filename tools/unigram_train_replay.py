#!/usr/bin/env python3
"""Independent replay behind q_unigram_train_round (driver-side oracle
tool).

The unigram trainer's round-1 E-step re-count is SQL-expressible EXCEPT
for the in-kernel Viterbi segmentation of each distinct corpus word.
This script derives that one missing piece independently: it loads the
FROZEN seed model (tools/unigram_seed_model.json, exported by
graft.tools.UnigramSeedExport with full-round-trip double logps — so
this replay's DP adds bit-identical binary64 values and resolves every
tie exactly as the kernel does), re-derives the distinct corpus words
from the parquet with its own tokenizer, and Viterbi-segments each word
from scratch (documented kernel semantics, no Scala code shared:
longest-piece-first strictly-greater replacement, single-char -100
fallback).

Output: the (word, piece) segmentation-instance VALUES block that the
q_unigram_train_round oracle joins against its SQL-derived word-
frequency table — the re-count, survival floor, and ranking all stay
pure SQL over corpus data.

Usage: unigram_train_replay.py <sf_dir> [--scala] [--model <file>] [--val <name>]
  default: tab-separated (word, piece) rows
  --scala: the Scala string literal for catalog/UnigramTrainPinned.scala
  --model: frozen model JSON to segment under (default
           unigram_seed_model.json -> the round-1 re-count; pass
           unigram_round1_v40s1_model.json, exported by
           graft.tools.UnigramRoundExport for the vocab=40/seedFactor=1
           scenario, for the round-2 re-count)
  --val:   Scala val name with --scala (default SegMapValues)
"""
import json
import os
import re
import sys

import pyarrow.parquet as pq

UNK_LOGP = -100.0


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
    as_scala = "--scala" in sys.argv
    model_file = "unigram_seed_model.json"
    if "--model" in sys.argv:
        model_file = sys.argv[sys.argv.index("--model") + 1]
    val_name = "SegMapValues"
    if "--val" in sys.argv:
        val_name = sys.argv[sys.argv.index("--val") + 1]
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, model_file)) as f:
        model = json.load(f)
    lp = {p: float(v) for p, c, v in model}
    max_len = max(len(p) for p in lp)

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    words = set()
    for text in tbl["text"].to_pylist():
        words.update(tokens(text or ""))

    rows = []
    for w in sorted(words):
        for piece in viterbi(w, lp, max_len):
            rows.append((w, piece))

    if as_scala:
        print(f"  val {val_name}: String =")
        body = ",\n".join(f"    |  ('{w}', '{p}')" for w, p in rows)
        print('    """(VALUES')
        print(body)
        print('    |) AS segmap(word, piece)""".stripMargin')
    else:
        for w, p in rows:
            print(f"{w}\t{p}")


if __name__ == "__main__":
    main()
