#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Registers every parquet table in sfDir under its basename, loads
outDir/oracle_sql.json, and for each query compares the Spark-written
parquet at outDir/<name>/ against the DuckDB result: row count, column
names (sorted), pandas dtype kind, and exact value match after sorting
columns by name and rows by all columns.

dtype kind matters: the driver HASHES values, so an int64 Spark column
vs a float64 DuckDB column (e.g. an uncast HUGEINT sum) hash-mismatches
even when the values compare numerically equal. We therefore flag any
int-vs-float kind divergence as a failure (this is exactly how the
round-10 q_token_budget red hid from the value-equality check).

Any non-matching query dumps the first N differing rows (both sides,
canon order) plus the DuckDB version into <outDir>/CORRECTNESS_diag.json
so a red row is self-diagnosing from the artifact alone.

Dev-tool only -- the shipped library has no Python.
"""
import duckdb
import glob
import json
import math
import os
import sys

DIAG_ROWS = 10

# Declared engine-parity float-boundary classes (README "cross-scale"
# note): the column holds round(x, 6) outputs whose pre-round inputs
# accumulate float-sum-order ulp drift (ln/PageRank-style sums); when
# the two engines' values straddle a half-ulp-at-6dp boundary the
# rounded outputs differ by exactly 1e-6. For declared queries such
# divergences on the declared columns are COUNTED (reported as
# float_boundary_rows) instead of failing, up to max_rows; anything
# larger, any divergence > one 6dp step, or any divergence on an
# undeclared column still fails. Row alignment for declared queries is
# keyed on the non-declared columns so a boundary value can't shuffle
# the canon sort.
FLOAT_BOUNDARY = {
    "q_score_crosssession": {"cols": {"boosted"}, "max_rows": 8},
}
BOUNDARY_STEP = 1.1e-6  # one 6dp rounding step, with float-repr slack


def canon(df, tol_cols=()):
    cols = sorted(df.columns)
    df = df[cols]
    # tolerance columns sort LAST so the declared-divergence rows still
    # align by their (unique) key columns
    order = [c for c in cols if c not in tol_cols] + \
        [c for c in cols if c in tol_cols]
    df = df.sort_values(by=order, kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def kind(dtype):
    # 'i'/'u' int-like, 'f' float, 'O' object, 'b' bool, 'M' datetime
    k = dtype.kind
    return "i" if k == "u" else k


def py(x):
    return x.item() if hasattr(x, "item") else x


def row_dict(df, i):
    return {c: repr(py(df[c].iloc[i])) for c in df.columns}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"create view {name} as select * from '{p}'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    results = {}
    diag = {"duckdb_version": duckdb.__version__, "queries": {}}
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = f"{outdir}/{name}"
        entry = {"rows_match": False, "schema_match": False, "hash_match": False}
        tol = FLOAT_BOUNDARY.get(name, {})
        tol_cols = tol.get("cols", set())
        try:
            sdf = canon(con.sql(f"select * from '{spark_path}/*.parquet'").df(), tol_cols)
            ddf = canon(con.sql(sql).df(), tol_cols)
            entry["spark_rows"] = len(sdf)
            entry["duck_rows"] = len(ddf)
            entry["rows_match"] = len(sdf) == len(ddf)
            entry["schema_match"] = list(sdf.columns) == list(ddf.columns)
            if not entry["schema_match"]:
                entry["spark_cols"] = list(map(str, sdf.columns))
                entry["duck_cols"] = list(map(str, ddf.columns))
            if entry["rows_match"] and entry["schema_match"]:
                diffs = []
                # dtype-kind gate first: the driver hashes values, so an
                # int64-vs-float64 divergence is a real mismatch even when
                # the values compare numerically equal.
                dtype_bad = []
                for c in sdf.columns:
                    ks, kd = kind(sdf[c].dtype), kind(ddf[c].dtype)
                    # numeric int-vs-float divergence is driver-visible;
                    # object-vs-numeric likewise. identical kinds are fine.
                    if ks != kd and not (ks == "O" and kd == "O"):
                        dtype_bad.append(f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
                if dtype_bad:
                    entry["dtype_mismatch"] = dtype_bad
                ok = True
                boundary_rows = 0
                for c in sdf.columns:
                    sv, dv = list(sdf[c]), list(ddf[c])
                    for i, (x, y) in enumerate(zip(sv, dv)):
                        x, y = py(x), py(y)
                        if isinstance(x, float) or isinstance(y, float):
                            xn = x is None or (isinstance(x, float) and math.isnan(x))
                            yn = y is None or (isinstance(y, float) and math.isnan(y))
                            if xn and yn:
                                continue
                            if xn != yn or x != y:
                                if (c in tol_cols and not xn and not yn
                                        and abs(x - y) <= BOUNDARY_STEP):
                                    boundary_rows += 1
                                    continue
                                ok = False
                                diffs.append({"col": c, "row": i, "spark": repr(x), "duck": repr(y)})
                                if len(diffs) >= DIAG_ROWS:
                                    break
                        elif not values_equal(x, y):
                            ok = False
                            diffs.append({"col": c, "row": i, "spark": repr(x), "duck": repr(y)})
                            if len(diffs) >= DIAG_ROWS:
                                break
                    if len(diffs) >= DIAG_ROWS:
                        break
                if boundary_rows:
                    entry["float_boundary_rows"] = boundary_rows
                    entry["float_boundary_max"] = tol.get("max_rows", 0)
                    if boundary_rows > tol.get("max_rows", 0):
                        ok = False
                        diffs.append({"col": sorted(tol_cols)[0], "row": -1,
                                      "spark": f"{boundary_rows} boundary rows",
                                      "duck": f"max {tol.get('max_rows', 0)}"})
                if diffs:
                    entry["first_diff"] = (
                        f"col={diffs[0]['col']} row={diffs[0]['row']} "
                        f"spark={diffs[0]['spark']} duck={diffs[0]['duck']}"
                    )
                entry["hash_match"] = ok and not dtype_bad
                if not entry["hash_match"]:
                    q = {"diffs": diffs}
                    if dtype_bad:
                        q["dtype_mismatch"] = dtype_bad
                    # first DIAG_ROWS rows of both canon frames for context
                    q["spark_head"] = [row_dict(sdf, i) for i in range(min(DIAG_ROWS, len(sdf)))]
                    q["duck_head"] = [row_dict(ddf, i) for i in range(min(DIAG_ROWS, len(ddf)))]
                    diag["queries"][name] = q
            else:
                diag["queries"][name] = {
                    "rows": [entry.get("spark_rows"), entry.get("duck_rows")],
                    "spark_cols": entry.get("spark_cols"),
                    "duck_cols": entry.get("duck_cols"),
                }
        except Exception as e:
            entry["error"] = str(e)[:300]
            diag["queries"][name] = {"error": str(e)[:1000]}
        results[name] = entry
        status = "OK " if entry.get("hash_match") else "FAIL"
        print(f"{status} {name}: {json.dumps({k: v for k, v in entry.items() if k != 'name'})[:240]}")
    n_ok = sum(1 for e in results.values() if e.get("hash_match"))
    print(f"\n{n_ok}/{len(results)} hash-match (duckdb {duckdb.__version__})")
    with open(f"{outdir}/CORRECTNESS_diag.json", "w") as f:
        json.dump(diag, f, indent=1, default=str)
    if diag["queries"]:
        print(f"diag for {len(diag['queries'])} red queries -> {outdir}/CORRECTNESS_diag.json")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
