#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sf_dir> <verify_out_dir>

Reads <verify_out_dir>/<query>/ parquet dumps (written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, runs each oracle in DuckDB with the sf
tables registered as views, and compares: row count, column names, and
values (column-name-sorted, row-sorted, per-cell normalized). Exit 1 if any
query mismatches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    # decimals, dates, timestamps, ints, strings -> canonical str
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = []
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got_rel = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows) "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            if len(got) == 0:
                failures.append(name)
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"  {name}: COLUMN MISMATCH spark={sorted(got_cols)} "
                  f"duck={sorted(exp_cols)}")
            failures.append(name)
            continue
        # strict type check, both sides through DuckDB's type vocabulary
        got_types = dict(con.execute(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
        ).fetchall() and [(r[0], r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()])
        exp_types = dict((r[0], r[1]) for r in con.execute(
            f"DESCRIBE {oracle[name]}").fetchall())
        tdiff = {c: (got_types.get(c), exp_types.get(c))
                 for c in got_types
                 if got_types.get(c) != exp_types.get(c)}
        if tdiff:
            print(f"  {name}: TYPE MISMATCH {tdiff}")
            failures.append(name)
            continue
        gk, ek = table_key(got, got_cols), table_key(exp, exp_cols)
        if len(gk) != len(ek):
            print(f"  {name}: ROWCOUNT spark={len(gk)} duck={len(ek)}")
            failures.append(name)
            continue
        diffs = [(a, b) for a, b in zip(gk, ek) if a != b]
        if diffs:
            print(f"  {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]} "
                  f"(cols sorted: {sorted(got_cols)})")
            failures.append(name)
        else:
            print(f"  {name}: OK ({len(gk)} rows)")
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
