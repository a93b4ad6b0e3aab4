#!/usr/bin/env python3
"""Promote quiet-run bench details into tools/bench_walls.json.

Takes the run*_detail.json files of one or more ZERO-FLAGGED quiet
series (bench_series.sh output dirs or individual detail files) and
writes the per-row MIN wall plus that same run's cpu ("<name>@cpu"
keys) with the "_sf" tag — the committed reference graft.Bench bands,
re-times, and machine-classifies against (wall band: re-time trigger;
cpu band: the busted-row verdict "cpu" = contention vs "wall" =
dispatch wait). The cpu band is taken from the run that produced the
promoted wall (NOT an independent min across runs), so the pair is a
coherent sample and the "cpu" verdict isn't trigger-happy relative to
the wall band it accompanies.

Eligibility is enforced per row, not assumed: within each run, rows
named in load_flagged and rows with nonzero spill bytes are skipped
(their number in THAT run was contended/pressured; other rows of the
same run remain valid min samples). A run with nothing usable
contributes nothing. --strict rejects any run with flagged rows or
spill outright (the old whole-run rule); --force downgrades even that
to a warning. Rows present in only some runs (new queries mid-round)
take the min over the runs that have them.

Regression guard (VERDICT r13 #3): any row whose new wall is >15%
above its wall in the EXISTING output file (same sf) is refused unless
explicitly adjudicated with --adjudicate name=reason (repeatable).
Adjudications are emitted into the output as "_adj_<name>" string
entries so the committed walls file carries its own evidence. The
right response to an unexplained regression is a fresh quieter series,
not an adjudication.

Usage: promote_walls.py <detail.json | series_dir> ...
         [--out FILE] [--strict] [--force] [--adjudicate name=reason] ...
"""
import json
import os
import sys

REGRESSION_FACTOR = 1.15
REGRESSION_SLACK_SEC = 0.05  # sub-50 ms jitter on tiny rows isn't a slip


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
    adjudications = {}
    while "--adjudicate" in argv:
        i = argv.index("--adjudicate")
        if i + 1 >= len(argv) or "=" not in argv[i + 1]:
            sys.exit("--adjudicate requires name=reason")
        name, reason = argv[i + 1].split("=", 1)
        adjudications[name] = reason
        argv = argv[:i] + argv[i + 2:]
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
    best = {}  # name -> [wall, cpu-of-that-run or None]
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
        cpu_d = d.get("cpu", {})
        for name, wall in d["queries"].items():
            if wall < 0 or name in flagged or name in spilled:
                continue
            if name not in best or wall < best[name][0]:
                c = cpu_d.get(name)
                best[name] = [wall, c if (c is not None and c >= 0) else None]
    # regression guard vs the existing committed walls (same sf only)
    prior = {}
    if os.path.exists(out):
        try:
            with open(out) as fh:
                prev = json.load(fh)
            if prev.get("_sf") == sf:
                prior = {k: v for k, v in prev.items()
                         if not k.startswith("_") and not k.endswith("@cpu")
                         and isinstance(v, (int, float))}
        except (json.JSONDecodeError, OSError):
            pass
    slipped = {}
    for name, (wall, _) in sorted(best.items()):
        p = prior.get(name)
        if p is not None and wall > p * REGRESSION_FACTOR \
                and wall > p + REGRESSION_SLACK_SEC:
            slipped[name] = (p, wall)
    unexplained = {n: v for n, v in slipped.items() if n not in adjudications}
    for n, (p, w) in sorted(slipped.items()):
        pct = 100.0 * (w - p) / p
        tag = f"adjudicated: {adjudications[n]}" if n in adjudications \
            else "UNADJUDICATED"
        print(f"regression {n}: {p:.3f}s -> {w:.3f}s (+{pct:.0f}%) [{tag}]",
              file=sys.stderr)
    stale = sorted(set(adjudications) - set(slipped))
    if stale:
        sys.exit(f"--adjudicate for non-regressed rows: {stale}")
    if unexplained:
        sys.exit(
            f"refusing to promote {len(unexplained)} row(s) >15% above "
            f"their committed walls: {sorted(unexplained)}. Run a fresh "
            f"quieter series and merge, or pass --adjudicate name=reason "
            f"after verifying the wall/cpu/jobs triple (BASELINE §26c).")
    rec = {"_sf": sf}
    for name in sorted(best):
        rec[name] = round(best[name][0], 3)
    for name in sorted(best):
        if best[name][1] is not None:
            rec[f"{name}@cpu"] = round(best[name][1], 2)
    for name in sorted(adjudications):
        p, w = slipped[name]
        rec[f"_adj_{name}"] = (f"{p:.3f}s -> {w:.3f}s "
                               f"(+{100.0 * (w - p) / p:.0f}%): "
                               f"{adjudications[name]}")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=0)
        fh.write("\n")
    n_cpu = sum(1 for v in best.values() if v[1] is not None)
    print(f"wrote {out}: {len(best)} walls + {n_cpu} cpu bands "
          f"from {len(files)} runs (sf={sf})"
          + (f", {len(adjudications)} adjudicated" if adjudications else ""))


if __name__ == "__main__":
    main()
