#!/usr/bin/env python3
"""Cross-series bench adjudication (BASELINE §16 protocol).

Usage: python3 tools/bench_compare.py <seriesDirA> <seriesDirB> [ratioFlag]

Takes per-query minima over each series' run*_detail.json, restricts to
the shared rows, and prints:
  - shared-row WALL ratio (B/A) and CPU-seconds ratio (B/A)
  - the verdict the two ratios support:
      wall~1, cpu~1      -> comparable windows, rows are comparable
      wall>1, cpu>1      -> HOST window slower (co-tenant contention /
                            frequency) — per-row regressions unreliable
      wall>1, cpu~1      -> scheduler stalls (descheduling) — same
      wall~1, cpu>1      -> more work per row on B: suspect a real
                            code change, inspect rows
  - per-row regressions above ratioFlag (default 1.2) AFTER dividing
    out the cpu ratio (i.e. host-speed-normalized) — the rows worth
    reading as real.

Dev-tool only — the shipped library has no Python.
"""
import glob
import json
import sys


def minima(series):
    wall, cpu, jobs = {}, {}, {}
    for p in sorted(glob.glob(f"{series}/run*_detail.json")):
        d = json.load(open(p))
        for k, v in d["queries"].items():
            wall[k] = min(wall.get(k, 1e18), v)
        for k, v in d.get("cpu", {}).items():
            cpu[k] = min(cpu.get(k, 1e18), v)
        # job counts per pass: record the SET seen across runs — a
        # single stable value is the common case; >1 distinct value is
        # itself the finding (plan/branch nondeterminism)
        for k, v in d.get("jobs_pass2", {}).items():
            jobs.setdefault(k, set()).add(v)
    return wall, cpu, jobs


def main():
    a, b = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    wa, ca, ja = minima(a)
    wb, cb, jb = minima(b)
    shared = sorted(set(wa) & set(wb))
    if not shared:
        print("no shared rows")
        return
    swa, swb = sum(wa[k] for k in shared), sum(wb[k] for k in shared)
    cshared = [k for k in shared if k in ca and k in cb]
    sca, scb = sum(ca[k] for k in cshared), sum(cb[k] for k in cshared)
    wr = swb / swa
    cr = scb / sca if sca else float("nan")
    print(f"shared rows: {len(shared)}")
    print(f"wall ratio (B/A): {swb:.1f}/{swa:.1f} = {wr:.3f}")
    print(f"cpu  ratio (B/A): {scb:.1f}/{sca:.1f} = {cr:.3f}")
    if wr > 1.05 and cr > 1.05:
        print("verdict: HOST window slower on B (wall AND cpu up) — "
              "normalize before reading rows")
    elif wr > 1.05 and cr <= 1.05:
        print("verdict: scheduler stalls on B (wall up, cpu flat)")
    elif wr <= 1.05 and cr > 1.05:
        print("verdict: more work per row on B — suspect a code change")
    else:
        print("verdict: comparable windows")
    norm = cr if cr == cr and cr > 0 else 1.0
    regs = [(wb[k] / wa[k] / norm, k, wa[k], wb[k])
            for k in shared if wa[k] > 0.3 and wb[k] / wa[k] / norm > flag]
    print(f"host-normalized regressions > {flag}x (base > 0.3 s): {len(regs)}")
    for r, k, x, y in sorted(regs, reverse=True):
        # decisive witness when available (BASELINE s20): flat warm-pass
        # job counts across A and B => the row did identical work, the
        # wall delta is window/JIT; differing counts => real change
        sa, sb = ja.get(k), jb.get(k)
        if sa and sb:
            tag = ("jobs flat %s" % sorted(sa)[0]) if sa == sb and len(sa) == 1 \
                else "jobs A=%s B=%s  <-- REAL CHANGE?" % (sorted(sa), sorted(sb))
        else:
            tag = "no job data"
        print(f"  {k}: {x:.2f} -> {y:.2f}  ({r:.2f}x normalized, {tag})")


if __name__ == "__main__":
    main()
