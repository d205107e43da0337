#!/bin/bash
# sf10 probe (100×-direction evidence): build target/sf10 (100× of the
# driver's sf0.1 tree via graft.ScaleUp), run the scale-sensitive query
# tier single-pass cold (graft.Sf10Probe) against a stated per-query
# budget, and — where DuckDB can manage the oracle at 100× — hash-check
# a correctness subset (CORRECTNESS_sf10_subset.json; oracle timeouts
# are recorded as unverified-at-this-sf, not as mismatches).
#
# Heavy (~18 GB tree, tens of minutes): run when the probe tier or
# ScaleUp changes, not per-commit. Commit both artifacts when green.
set -e -o pipefail
cd "$(dirname "$0")/.."

BUDGET="${SF10_BUDGET_SEC:-300}"
# 900: q163's full 500k-doc envelope oracle completes in ~700-850 s and
# hash-matches all 6.08M pairs — at 600 it recorded a timeout, and
# q247's scored CTE sits right at the 600 boundary (green at ~550,
# timed out at 600 on a rerun the same day).
ORACLE_TIMEOUT="${SF10_ORACLE_TIMEOUT_SEC:-900}"
# The oracle-checkable slice of the probe tier. Per-query infeasibility
# notes for the excluded ones live in PLANS.md ("sf10 oracle
# feasibility, per query"); the short version: q78 OOM-kills DuckDB,
# q104/q185 need an n² verify over 500k+ names, q161–q165 regenerate
# per-doc media formulas corpus-wide (q163 stays listed so the artifact
# records the honest unverified-at-this-sf timeout; q283 is its
# bounded-window hash anchor), q138/q168/q210 have corpus-sized
# sequential/self-join CTEs, q282's interval oracle is feasible — it
# joins the list here.
ORACLE_QUERIES="${SF10_ORACLE_QUERIES:-q103_range_join q163_audio_neardup q246_streamed_neardups q247_streamed_curation q282_spike_window_pairs q283_audio_neardup_cert}"

if [ ! -d target/sf10/lineitem.parquet ]; then
  echo "[sf10] generating target/sf10 (100x sf0.1) ..."
  SPARK_DRIVER_MEM=24g sbt -batch \
    "runMain graft.ScaleUp /root/testdata/sf0.1 target/sf10 100" \
    2>&1 | grep -E '\[scaleup\]' \
    || { echo "[sf10] ScaleUp FAILED"; exit 1; }
fi

echo "[sf10] probe (single pass, budget ${BUDGET}s/query) ..."
rm -f BENCH_sf10_subset.json
SPARK_GRAFT_SF_DIR="$PWD/target/sf10" SPARK_GRAFT_CPUS=32 \
SF10_BUDGET_SEC="$BUDGET" SPARK_DRIVER_MEM=24g \
sbt -batch "runMain graft.Sf10Probe" 2>&1 | grep '"metric"' | tail -1
[ -f BENCH_sf10_subset.json ] || { echo "[sf10] FAIL: probe wrote no artifact"; exit 1; }

echo "[sf10] oracle subset (timeout ${ORACLE_TIMEOUT}s/query) ..."
rm -rf target/verify_sf10
# sbt's own exit status is checked DIRECTLY (tee + $?), then the log is
# grepped separately: the old `sbt | grep failed && exit` construct only
# failed when the literal line was printed — an sbt crash with no such
# line left grep failing (errexit-exempt on the left of &&) and the
# script continued over a partially written verify tree.
VERIFY_LOG=target/verify_sf10_run.log
set +e
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g sbt -batch \
  "runMain graft.Verify $PWD/target/sf10 target/verify_sf10 $ORACLE_QUERIES" \
  2>&1 | tee "$VERIFY_LOG" | grep -E '^\[|error' | tail -5
sbt_rc=${PIPESTATUS[0]}
set -e
[ "$sbt_rc" -eq 0 ] || { echo "[sf10] Verify sbt exited $sbt_rc"; exit 1; }
grep -qi '\[verify\].*failed' "$VERIFY_LOG" \
  && { echo "[sf10] Verify reported per-query failures"; exit 1; }
# compare.py itself fails on: mismatch, a requested query with no
# output dir (crashed Verify), or any vacuous 0=0 match.
COMPARE_ORACLE_TIMEOUT_SEC="$ORACLE_TIMEOUT" \
COMPARE_JSON_OUT=CORRECTNESS_sf10_subset.json \
python3 tools/compare.py "$PWD/target/sf10" target/verify_sf10 $ORACLE_QUERIES

python3 - "$BUDGET" <<'EOF'
import json, sys
b = json.load(open("BENCH_sf10_subset.json"))
bad = []
if b.get("failed"):
    bad.append(f"crashed queries: {b['failed']}")
if b.get("n_over_budget", 0) > 0:
    bad.append(f"over budget ({b['budget_sec']}s): {b['over_budget']}")
if bad:
    print("[sf10] FAIL:", "; ".join(bad))
    sys.exit(1)
print(f"[sf10] OK: total={b['value']}s n={b['n_queries']} over_budget=0 failed=0")
EOF

# Artifacts written by THIS run are fresh by construction; the guard is
# for the commit path — it refuses to green-light artifacts that
# predate the newest engine commit (the r15 stale-q163 class).
tools/artifact_freshness.sh BENCH_sf10_subset.json CORRECTNESS_sf10_subset.json
