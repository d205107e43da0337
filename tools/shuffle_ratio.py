#!/usr/bin/env python3
"""Mechanical superlinear-data-motion report.

Compares per-query shuffle-write bytes between two bench artifacts at
different scale factors and flags queries whose byte growth exceeds the
nominal data growth — the signal wall-clock ratios only expose when a
human watches a slow run. Scale-correct queries move ~scale x the bytes
(ratio/scale ~ 1); a bucket-quadratic join shows up as ratio/scale >> 1
long before it times out.

Usage:
  python3 tools/shuffle_ratio.py SMALL.json BIG.json SCALE [--top N]
  python3 tools/shuffle_ratio.py bench_results.json BENCH_sf10.json 100

Output: one line per flagged query (normalized ratio > FLAG, default 15),
then a summary. Exit 0 always — this is a report, not a gate; flagged
entries get audited in PLANS.md per the round discipline.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 3:
        print(__doc__)
        return 2
    small_f, big_f, scale_s = args
    scale = float(scale_s)
    top = 0
    flag = 15.0
    argv = sys.argv[1:]
    if "--top" in argv:
        top = int(argv[argv.index("--top") + 1])
    if "--flag" in argv:
        flag = float(argv[argv.index("--flag") + 1])

    small = json.load(open(small_f))
    big = json.load(open(big_f))
    sw_small = small.get("shuffle_write_bytes", {})
    sw_big = big.get("shuffle_write_bytes", {})
    spill_big = big.get("spilled_bytes", {})
    if not sw_small or not sw_big:
        print("FAIL: one of the artifacts carries no shuffle_write_bytes "
              "map (re-run the bench on a build with data-movement "
              "telemetry)")
        return 1

    MIN_BYTES = 64 << 20  # ignore queries that move <64 MB at the big sf:
    # tiny absolute motion makes ratios noise (a 2 KB -> 1 MB metadata
    # delta is a 500x "ratio" that means nothing at 100 TB)
    MIN_SMALL = 1 << 20  # the denominator must be in a meaningful regime:
    # at small sf, AQE converts many shuffles to broadcasts or coalesces
    # them to near-zero bytes, so a sub-MB small-sf number inflates the
    # ratio without implying superlinear motion. Those queries are
    # counted as "unrated" instead of flagged.
    rows = []
    unrated = 0
    for q, b_big in sw_big.items():
        b_small = sw_small.get(q)
        if b_small is None or b_big < MIN_BYTES:
            continue
        if b_small < MIN_SMALL:
            unrated += 1
            continue
        ratio = b_big / b_small / scale
        rows.append((ratio, q, b_small, b_big, spill_big.get(q, 0)))
    rows.sort(reverse=True)

    def gb(n):
        return f"{n / (1 << 30):.2f}G" if n >= 1 << 26 else f"{n >> 20}M"

    flagged = [r for r in rows if r[0] > flag]
    shown = rows[:top] if top else flagged
    print(f"# shuffle-write growth, {small_f} -> {big_f} (nominal {scale:g}x)")
    print(f"# normalized ratio = big_bytes / small_bytes / {scale:g}; "
          f"flag > {flag:g}; floor {MIN_BYTES >> 20} MB at the big sf")
    for ratio, q, b_s, b_b, sp in shown:
        mark = " FLAG" if ratio > flag else ""
        spill = f" spill={gb(sp)}" if sp else ""
        print(f"{q}: x{ratio:.1f} ({gb(b_s)} -> {gb(b_b)}){spill}{mark}")
    print(f"# {len(flagged)} flagged / {len(rows)} rated; {unrated} "
          f"unrated (small-sf bytes < {MIN_SMALL >> 20} MB — AQE "
          f"broadcast/coalesce regime, ratio denominator meaningless)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
