#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each query result parquet in outDir and its oracle SQL in
oracle_sql.json, runs the SQL in DuckDB over views named after the
parquet tables in sfDir, canonicalizes both result sets (columns sorted
by name, rows sorted by all columns), and reports exact-match status.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel):
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = df.values.tolist()

    def key(row):
        return [(x is None, str(type(x)), str(x)) for x in row]

    rows.sort(key=key)
    return df.columns.tolist(), [[norm(x) for x in row] for row in rows]


def norm(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return x
    if hasattr(x, "ndim") and getattr(x, "ndim", 0) > 0:  # numpy array
        return [norm(v) for v in x.tolist()]
    if hasattr(x, "item"):  # numpy scalar
        try:
            return norm(x.item())
        except Exception:
            pass
    if isinstance(x, (list, tuple)):
        return [norm(v) for v in x]
    if isinstance(x, dict):
        return {k: norm(v) for k, v in x.items()}
    return x


def values_equal(a, b):
    if type(a) is float and type(b) is float:
        if a == b:
            return True
        return False
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(values_equal(a[k], b[k]) for k in a)
    return a == b or str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    # queries this Verify run actually attempted: a missing result for an
    # attempted query is an engine crash (FAIL); only filter-excluded
    # queries are skipped. Older dumps without the manifest attempt all.
    attempted = None
    if os.path.exists(f"{out_dir}/attempted.json"):
        with open(f"{out_dir}/attempted.json") as f:
            attempted = set(json.load(f))

    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if attempted is not None and name not in attempted:
            n_skip += 1
            continue
        try:
            got_cols, got = canon(
                con, con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp_cols, exp = canon(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ spark={got_cols} oracle={exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: row count spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if not values_equal(g, e):
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: first diff at sorted-row {i}:")
            print(f"  spark : {g}")
            print(f"  oracle: {e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} passed, {n_fail} failed, {n_skip} skipped ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
