#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Registers every parquet table in sfDir under its basename, loads
outDir/oracle_sql.json, and for each query compares the Spark-written
parquet at outDir/<name>/ against the DuckDB result: row count, column
names (sorted), and exact value match after sorting columns by name and
rows by all columns. Dev-tool only — the shipped library has no Python.
"""
import duckdb
import glob
import json
import math
import os
import sys


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"create view {name} as select * from '{p}'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = f"{outdir}/{name}"
        entry = {"rows_match": False, "schema_match": False, "hash_match": False}
        try:
            sdf = canon(con.sql(f"select * from '{spark_path}/*.parquet'").df())
            ddf = canon(con.sql(sql).df())
            entry["spark_rows"] = len(sdf)
            entry["duck_rows"] = len(ddf)
            entry["rows_match"] = len(sdf) == len(ddf)
            entry["schema_match"] = list(sdf.columns) == list(ddf.columns)
            if not entry["schema_match"]:
                entry["spark_cols"] = list(map(str, sdf.columns))
                entry["duck_cols"] = list(map(str, ddf.columns))
            if entry["rows_match"] and entry["schema_match"]:
                ok = True
                for c in sdf.columns:
                    sv, dv = list(sdf[c]), list(ddf[c])
                    for i, (x, y) in enumerate(zip(sv, dv)):
                        # numpy scalars -> python
                        x = x.item() if hasattr(x, "item") else x
                        y = y.item() if hasattr(y, "item") else y
                        if isinstance(x, float) or isinstance(y, float):
                            xn = x is None or (isinstance(x, float) and math.isnan(x))
                            yn = y is None or (isinstance(y, float) and math.isnan(y))
                            if xn and yn:
                                continue
                            if xn != yn or x != y:
                                ok = False
                                entry.setdefault("first_diff", f"col={c} row={i} spark={x!r} duck={y!r}")
                                break
                        elif not values_equal(x, y):
                            ok = False
                            entry.setdefault("first_diff", f"col={c} row={i} spark={x!r} duck={y!r}")
                            break
                    if not ok:
                        break
                entry["hash_match"] = ok
        except Exception as e:
            entry["error"] = str(e)[:300]
        results[name] = entry
        status = "OK " if entry.get("hash_match") else "FAIL"
        print(f"{status} {name}: {json.dumps({k: v for k, v in entry.items() if k != 'name'})[:240]}")
    n_ok = sum(1 for e in results.values() if e.get("hash_match"))
    print(f"\n{n_ok}/{len(results)} hash-match")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
