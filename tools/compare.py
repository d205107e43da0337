#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sf_dir> <verify_out_dir> [query ...]

Reads <verify_out_dir>/<query>/ parquet dumps (written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, runs each oracle in DuckDB with the sf
tables registered as views, and compares: row count, column names, and
values (column-name-sorted, row-sorted, per-cell normalized). Exit 1 if any
query mismatches.

Optional query names restrict the run. Env knobs (for at-scale runs where
some ORACLES are themselves super-linear):
  COMPARE_ORACLE_TIMEOUT_SEC  interrupt a DuckDB oracle after this many
                              seconds; reported as ORACLE TIMEOUT and
                              counted separately from mismatches
  COMPARE_JSON_OUT            also write a per-query JSON artifact in the
                              driver's CORRECTNESS_r{N}.json shape
"""
import json
import math
import os
import sys
import threading
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
    only = set(sys.argv[3:])
    timeout = float(os.environ.get("COMPARE_ORACLE_TIMEOUT_SEC", "0"))
    json_out = os.environ.get("COMPARE_JSON_OUT", "")
    con = duckdb.connect()
    # In-memory DuckDB has no temp_directory, so a big-tree oracle (the
    # sf10 range join) aborts at the memory limit instead of spilling.
    # Give it an out-of-core path as OVERFLOW only — the memory cap
    # stays near the box's RAM (a low cap pushes corpus-wide CTE chains
    # to disk wholesale and fills the volume instead). Both overridable.
    tmp = os.environ.get("COMPARE_DUCKDB_TMP", "/tmp/duckdb_compare_spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET memory_limit='"
                + os.environ.get("COMPARE_DUCKDB_MEM", "100GB") + "'")
    for t in TABLES:
        # driver testdata is single-file; ScaleUp trees are directories
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = []
    timeouts = []
    report = {}

    def run_oracle(sql):
        """Execute with an optional wall-clock interrupt: a super-linear
        ORACLE (recursive-CTE closures at 10x sf) must not wedge the
        whole compare — its query is reported as unverified-at-this-sf,
        not as a mismatch.

        The timer callback re-checks a done flag under a lock: a raw
        Timer(timeout, con.interrupt) can fire in the window between the
        oracle completing and timer.cancel(), leaving a pending
        interrupt that aborts the NEXT con.execute (including the
        spark-parquet read at the top of the loop) — misattributing one
        near-deadline oracle as a crash of the following query."""
        if timeout <= 0:
            rel = con.execute(sql)
            return [d[0] for d in rel.description], rel.fetchall()
        lock = threading.Lock()
        state = {"done": False}

        def interrupt_if_running():
            with lock:
                if not state["done"]:
                    con.interrupt()

        timer = threading.Timer(timeout, interrupt_if_running)
        timer.start()
        try:
            rel = con.execute(sql)
            rows = rel.fetchall()
            # Close the race NOW, not in the finally: the timer could
            # otherwise fire between fetchall() returning and the finally
            # block running, interrupting an idle connection and aborting
            # the NEXT con.execute.
            with lock:
                state["done"] = True
            return [d[0] for d in rel.description], rows
        finally:
            with lock:
                state["done"] = True
            timer.cancel()

    present = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    # A requested query with no output dir is a FAILURE, not a skip: a
    # crashed Verify run leaves a partial tree, and silently iterating
    # only what exists would print ALL OK over a subset (the r15 advice
    # finding on sf10_probe.sh). In the default no-args mode the
    # expected set is every key of oracle_sql.json — a full-suite run
    # that crashed mid-way must fail the same check, not green-light
    # the dirs that happened to get written (the r16 advice finding).
    expected = only if only else set(oracle)
    for missing in sorted(expected - set(present)):
        print(f"  {missing}: NO OUTPUT DIR under {out_dir} "
              f"(Verify crashed or never ran it)")
        failures.append(missing)
        report[missing] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "spark_rows": None,
                           "oracle_rows": None,
                           "err": "no verify output dir"}
    for name in present:
        if only and name not in only:
            continue
        got_rel = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": len(got),
                        "oracle_rows": None, "err": None}
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows) "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            if len(got) == 0:
                failures.append(name)
                report[name]["err"] = "rows-only check: empty result"
            else:
                report[name] = {"rows_match": True, "schema_match": None,
                                "hash_match": None, "spark_rows": len(got),
                                "oracle_rows": None, "err": None}
            continue
        try:
            exp_cols, exp = run_oracle(oracle[name])
        except duckdb.InterruptException:
            print(f"  {name}: ORACLE TIMEOUT (> {timeout:.0f}s)")
            timeouts.append(name)
            report[name]["err"] = f"oracle timeout > {timeout:.0f}s"
            continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"  {name}: ORACLE TIMEOUT (> {timeout:.0f}s)")
                timeouts.append(name)
                report[name]["err"] = f"oracle timeout > {timeout:.0f}s"
                continue
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            failures.append(name)
            report[name]["err"] = f"oracle sql error: {e}"
            continue
        report[name]["oracle_rows"] = len(exp)
        if sorted(got_cols) != sorted(exp_cols):
            print(f"  {name}: COLUMN MISMATCH spark={sorted(got_cols)} "
                  f"duck={sorted(exp_cols)}")
            failures.append(name)
            report[name]["err"] = "column mismatch"
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
            report[name]["err"] = f"type mismatch {tdiff}"
            continue
        report[name]["schema_match"] = True
        gk, ek = table_key(got, got_cols), table_key(exp, exp_cols)
        if len(gk) != len(ek):
            print(f"  {name}: ROWCOUNT spark={len(gk)} duck={len(ek)}")
            failures.append(name)
            report[name]["err"] = "rowcount mismatch"
            continue
        report[name]["rows_match"] = True
        diffs = [(a, b) for a, b in zip(gk, ek) if a != b]
        if diffs:
            print(f"  {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]} "
                  f"(cols sorted: {sorted(got_cols)})")
            failures.append(name)
            report[name]["err"] = f"{len(diffs)} differing rows"
        elif len(gk) == 0:
            # A 0=0 "triple pass" certifies nothing — the query may have
            # sliced/filtered itself to emptiness on this tree (this is how
            # q247's sf1 certification went vacuous in r14). Flag it loudly
            # and in the JSON so a committed artifact can't hide it.
            print(f"  {name}: VACUOUS (0 rows on BOTH sides — match proves "
                  f"nothing at this sf)")
            report[name]["hash_match"] = True
            report[name]["vacuous"] = True
        else:
            print(f"  {name}: OK ({len(gk)} rows)")
            report[name]["hash_match"] = True
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=0))
        print(f"wrote {json_out}")
    vacuous = [n for n, r in report.items() if r.get("vacuous")]
    if vacuous:
        print(f"VACUOUS 0=0 MATCHES ({len(vacuous)}): {vacuous}")
    if timeouts:
        print(f"ORACLE TIMEOUTS ({len(timeouts)}): {timeouts}")
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    # A vacuous 0=0 "pass" certifies nothing — fail the exit code too,
    # so the gate scripts consume the flag mechanically instead of
    # relying on a human reading stdout/JSON (the JSON keeps
    # hash_match=true + vacuous=true so the artifact distinguishes
    # "values matched on an empty set" from a real mismatch).
    # COMPARE_ALLOW_VACUOUS=1 opts out for trees where emptiness is the
    # expected fixture shape.
    if vacuous and os.environ.get("COMPARE_ALLOW_VACUOUS", "") != "1":
        print("FAILED: vacuous 0=0 matches (set COMPARE_ALLOW_VACUOUS=1 "
              "if emptiness is expected on this tree)")
        sys.exit(1)
    print("ALL OK" + (f" ({len(timeouts)} oracle timeouts)"
                      if timeouts else ""))


if __name__ == "__main__":
    main()
