#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <verify-out-dir> <sf-dir> [query...]

For each query dumped by graft.Verify: run the oracle SQL in DuckDB over the
same parquet tables, sort columns by name, sort rows by all columns, and
compare values exactly (the driver hashes; exact equality is strictly
stronger).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        # exact IEEE compare, but normalize -0.0 and NaN representations
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            s_rows = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            s_cols = [d[0] for d in con.description]
            o_rows = con.execute(oracle[name]).fetchall()
            o_cols = [d[0] for d in con.description]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            failures += 1
            continue
        sc, sv = frame(s_rows, s_cols)
        oc, ov = frame(o_rows, o_cols)
        if sc != oc:
            print(f"{name}: SCHEMA mismatch spark={sc} oracle={oc}")
            failures += 1
        elif len(sv) != len(ov):
            print(f"{name}: ROWS mismatch spark={len(sv)} oracle={len(ov)}")
            failures += 1
        elif sv != ov:
            bad = next(i for i in range(len(sv)) if sv[i] != ov[i])
            print(f"{name}: VALUE mismatch at sorted row {bad}:\n"
                  f"  spark : {sv[bad]}\n  oracle: {ov[bad]}")
            failures += 1
        else:
            print(f"{name}: ok ({len(sv)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
