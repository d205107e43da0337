#!/bin/bash
# sf1 scale gate (per-round): run the full bench suite single-pass on the
# 10x tree and assert the scale story holds round-over-round:
#   - fleet median ratio vs the COMMITTED BENCH_sf1.json <= FLEET_MAX (3x)
#   - no query over the sf1 wall-clock budget (80 s)
#   - no crashed queries
# Regenerates target/sf1 via graft.ScaleUp when missing. Writes/overwrites
# BENCH_sf1.json in the repo root (commit it when green — it becomes the
# next round's baseline). Exit 1 on any gate failure.
set -e -o pipefail
cd "$(dirname "$0")/.."

FLEET_MAX="${SF1_FLEET_MAX:-3.0}"
BUDGET="${SF1_BUDGET_SEC:-80}"

if [ ! -d target/sf1/lineitem.parquet ]; then
  echo "[sf1_gate] generating target/sf1 (10x sf0.1) ..."
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1 10" \
    >/dev/null 2>&1 || { echo "[sf1_gate] ScaleUp FAILED"; exit 1; }
fi

echo "[sf1_gate] bench at sf1 (single pass, budget ${BUDGET}s) ..."
# Remove the committed artifact first: with set -e alone, a crashed sbt
# hidden behind the grep|tail pipe would leave the STALE committed
# BENCH_sf1.json in place and the python check would green-light it.
# pipefail (above) fails the pipe; deleting the file first guarantees the
# check can only ever validate a freshly written artifact.
rm -f BENCH_sf1.json
SPARK_GRAFT_SF_DIR="$PWD/target/sf1" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_PASSES=1 SPARK_GRAFT_QUERY_BUDGET_SEC="$BUDGET" \
SPARK_GRAFT_RESULTS_FILE=BENCH_sf1.json \
sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -2
[ -f BENCH_sf1.json ] || { echo "[sf1_gate] FAIL: bench did not write BENCH_sf1.json"; exit 1; }

python3 - "$FLEET_MAX" <<'EOF'
import json, sys
fleet_max = float(sys.argv[1])
b = json.load(open("BENCH_sf1.json"))
bad = []
if b.get("failed"):
    bad.append(f"crashed queries: {b['failed']}")
if b.get("n_over_budget", 0) > 0:
    bad.append(f"over budget ({b['budget_sec']}s): {b['over_budget']}")
fm = b.get("fleet_median_ratio")
if fm is not None and fm > fleet_max:
    bad.append(f"fleet median ratio {fm} > {fleet_max}")
regs = b.get("regressions", {})
if regs:
    worst = sorted(regs.items(), key=lambda kv: -kv[1])[:5]
    print(f"[sf1_gate] note: {len(regs)} per-query ratios >2x vs committed "
          f"baseline (worst: {worst}) — judged via fleet median + budget")
if bad:
    print("[sf1_gate] FAIL:", "; ".join(bad))
    sys.exit(1)
print(f"[sf1_gate] OK: total={b['value']}s n={b['n_queries']} "
      f"fleet_median_ratio={fm} over_budget=0 failed=0")
EOF

# Freshness guard (commit-path): refuse to green-light sf1 artifacts
# that predate the newest engine commit. Also sweeps the sf1
# correctness artifact if one is on disk from a manual verify run.
tools/artifact_freshness.sh BENCH_sf1.json CORRECTNESS_sf1_subset.json
