#!/usr/bin/env python3
"""Promote quiet-run bench details into tools/bench_walls.json.

Takes the run*_detail.json files of one or more ZERO-FLAGGED quiet
series (bench_series.sh output dirs or individual detail files) and
writes the per-row MIN wall plus the per-row MIN cpu ("<name>@cpu"
keys) with the "_sf" tag — the committed reference graft.Bench bands,
re-times, and machine-classifies against (wall band: re-time trigger;
cpu band: the busted-row verdict "cpu" = contention vs "wall" =
dispatch wait).

Eligibility is enforced per row, not assumed: within each run, rows
named in load_flagged and rows with nonzero spill bytes are skipped
(their number in THAT run was contended/pressured; other rows of the
same run remain valid min samples). A run with nothing usable
contributes nothing. --strict rejects any run with flagged rows or
spill outright (the old whole-run rule); --force downgrades even that
to a warning. Rows present in only some runs (new queries mid-round)
take the min over the runs that have them.

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
    argv = sys.argv[1:]
    force = "--force" in argv
    strict = "--strict" in argv
    out = "tools/bench_walls.json"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            sys.exit("--out requires a path")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    files = collect(args)
    if not files:
        sys.exit("no detail files given")
    walls, cpus = {}, {}
    sf = None
    for f in files:
        with open(f) as fh:
            d = json.load(fh)
        flagged = set(d.get("load_flagged", []))
        spill = d.get("spill", {})
        spilled = {n for n, v in spill.items()
                   if isinstance(v, list) and any(x > 0 for x in v)}
        spill_total = d.get("spill_total", 0)
        if strict and (flagged or spill_total) and not force:
            sys.exit(f"{f}: not a quiet run (load_flagged={sorted(flagged)}, "
                     f"spill_total={spill_total}); use --force to override")
        if flagged or spilled:
            print(f"{f}: skipping contended/pressured rows "
                  f"{sorted(flagged | spilled)}", file=sys.stderr)
        if sf is None:
            sf = d["sf"]
        elif sf != d["sf"]:
            sys.exit(f"{f}: sf {d['sf']} != {sf} — one walls file per sf")
        for name, wall in d["queries"].items():
            if wall < 0 or name in flagged or name in spilled:
                continue
            walls[name] = min(walls.get(name, float("inf")), wall)
        for name, cpu in d.get("cpu", {}).items():
            if cpu < 0 or d["queries"].get(name, -1) < 0 \
                    or name in flagged or name in spilled:
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
