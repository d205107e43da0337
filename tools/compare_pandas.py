#!/usr/bin/env python3
"""Pandas-level replica of the driver's oracle compare (the driver's
traceback shows pandas sort_values over all columns, so its value hashing
operates on pandas cell values — this script reproduces that channel and
prints per-cell diffs, dtype deltas, and repr deltas so mismatches that
tools/compare.py's DuckDB-native channel can't see become visible).

Usage: python3 tools/compare_pandas.py <sf_dir> <verify_out_dir> [query...]
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # The driver normalizes temporal cells (round 1: date-typed Spark output
    # vs timestamp-typed DuckDB output hash-MATCHED); mirror that by lifting
    # python dates to Timestamps and ignoring datetime64 unit differences.
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as e:
        print(f"    SORT CRASH (driver would die here): {e}")
        raise
    return df.reset_index(drop=True)


def cell_repr(v):
    if isinstance(v, float) and np.isnan(v):
        return "NaN"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = []
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        if only and name not in only:
            continue
        spark = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            try:
                canon(spark)
                print(f"  {name}: rows-only ({len(spark)} rows) sortable OK")
            except Exception:
                failures.append(name)
            continue
        duck = con.execute(oracle[name]).df()
        try:
            s, d = canon(spark), canon(duck)
        except Exception:
            failures.append(name)
            continue
        if list(s.columns) != list(d.columns):
            print(f"  {name}: COLUMNS spark={list(s.columns)} duck={list(d.columns)}")
            failures.append(name)
            continue
        dt = {c: (str(s[c].dtype), str(d[c].dtype)) for c in s.columns
              if str(s[c].dtype) != str(d[c].dtype)}
        ncell = 0
        example = None
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if cell_repr(a) != cell_repr(b):
                    ncell += 1
                    if example is None:
                        example = (c, i, cell_repr(a), cell_repr(b))
        status = "OK" if ncell == 0 and not dt else "MISMATCH"
        print(f"  {name}: {status} rows={len(s)} dtype_deltas={dt} "
              f"cell_diffs={ncell} first={example}")
        if status != "OK":
            failures.append(name)
    print(f"FAILED: {failures}" if failures else "ALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
