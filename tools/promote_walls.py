#!/usr/bin/env python3
"""Promote quiet-run bench details into tools/bench_walls.json.

Takes the run*_detail.json files of one or more ZERO-FLAGGED quiet
series (bench_series.sh output dirs or individual detail files) and
writes the per-row MIN wall plus the per-row MIN cpu ("<name>@cpu"
keys) with the "_sf" tag — the committed reference graft.Bench bands,
re-times, and machine-classifies against (wall band: re-time trigger;
cpu band: the busted-row verdict "cpu" = contention vs "wall" =
dispatch wait).

Eligibility is enforced, not assumed: a run whose compact/detail
record carries load_flagged > 0, band_busted rows with verdict
spill, or spill_total > 0 is rejected (pass --force to override with
an explicit stderr note). Rows present in only some runs (new queries
mid-round) take the min over the runs that have them.

Usage: promote_walls.py <detail.json | series_dir> ... [--out FILE] [--force]
"""
import json
import os
import sys


def collect(paths):
    files = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith("_detail.json"))
        else:
            files.append(p)
    return files


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    force = "--force" in sys.argv
    out = "tools/bench_walls.json"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    files = collect(args)
    if not files:
        sys.exit("no detail files given")
    walls, cpus = {}, {}
    sf = None
    for f in files:
        with open(f) as fh:
            d = json.load(fh)
        flagged = d.get("load_flagged", [])
        spill_total = d.get("spill_total", 0)
        if (flagged or spill_total) and not force:
            sys.exit(f"{f}: not a quiet run (load_flagged={flagged}, "
                     f"spill_total={spill_total}); use --force to override")
        if (flagged or spill_total) and force:
            print(f"WARNING: promoting non-quiet run {f}", file=sys.stderr)
        if sf is None:
            sf = d["sf"]
        elif sf != d["sf"]:
            sys.exit(f"{f}: sf {d['sf']} != {sf} — one walls file per sf")
        for name, wall in d["queries"].items():
            if wall < 0:
                continue
            walls[name] = min(walls.get(name, float("inf")), wall)
        for name, cpu in d.get("cpu", {}).items():
            if cpu < 0 or d["queries"].get(name, -1) < 0:
                continue
            cpus[name] = min(cpus.get(name, float("inf")), cpu)
    rec = {"_sf": sf}
    for name in sorted(walls):
        rec[name] = round(walls[name], 3)
    for name in sorted(cpus):
        rec[f"{name}@cpu"] = round(cpus[name], 2)
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=0)
        fh.write("\n")
    print(f"wrote {out}: {len(walls)} walls + {len(cpus)} cpu bands "
          f"from {len(files)} runs (sf={sf})")


if __name__ == "__main__":
    main()
