#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev harness only).

Usage: verify_local.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB against the sfDir parquet tables, and compares with the Spark
parquet result in <outDir>/<name>/. Columns are compared sorted by name
(mirroring the driver's hash), rows both in-order and as sorted multiset.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def fetch(con, sql):
    cur = con.sql(sql)
    cols = cur.columns
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_cols = [cols[i] for i in order]
    out_rows = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return out_cols, out_rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            o_cols, o_rows = fetch(con, sql)
        except Exception as e:
            print(f"{name}: ORACLE ERROR {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            s_cols, s_rows = fetch(
                duckdb.connect(), f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"{name}: SPARK RESULT MISSING {str(e)[:120]}")
            n_bad += 1
            continue
        if o_cols != s_cols:
            print(f"{name}: COLUMN MISMATCH oracle={o_cols} spark={s_cols}")
            n_bad += 1
            continue
        if o_rows == s_rows:
            print(f"{name}: MATCH ({len(o_rows)} rows)")
            n_ok += 1
            continue
        if sorted(map(repr, o_rows)) == sorted(map(repr, s_rows)):
            print(f"{name}: MATCH-UNORDERED ({len(o_rows)} rows) — row order differs!")
            n_bad += 1
            continue
        print(f"{name}: VALUE MISMATCH oracle={len(o_rows)} spark={len(s_rows)} rows")
        o_set = set(map(repr, o_rows))
        s_set = set(map(repr, s_rows))
        for r in list(o_rows)[:2000]:
            if repr(r) not in s_set:
                print(f"  only-oracle: {r}")
                break
        for r in list(s_rows)[:2000]:
            if repr(r) not in o_set:
                print(f"  only-spark:  {r}")
                break
        # aligned first-diff for ordered compare
        for i, (a, b) in enumerate(zip(o_rows, s_rows)):
            if a != b:
                print(f"  row {i}: oracle={a}")
                print(f"         spark ={b}")
                break
        n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
