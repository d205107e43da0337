#!/usr/bin/env python3
"""Stage-level attribution from a Spark event log (JSON lines).

Prints one row per completed stage, descending by wall-clock duration:
stage id/attempt, name (truncated), duration, task count, summed task
run time, GC time, shuffle read/write bytes, memory+disk spill, input
bytes — the decomposition that localized q37's sf10 spill to its
presentation sort (r17) when query-level numbers could not.

Usage: tools/stage_attribution.py EVENTLOG [EVENTLOG ...]
       (pass the eventlog_v2_*/events_* file or its directory)
"""
import json, os, sys


def log_files(path):
    """All event-log parts for a run, in order. Rolling logs split into
    events_1_*, events_2_*, ...; returning only part 1 silently truncated
    long runs to their first segment (r18 advice finding)."""
    if os.path.isdir(path):
        parts = sorted(
            (name for name in os.listdir(path)
             if name.startswith("events_")),
            key=lambda n: int(n.split("_")[1]) if
            n.split("_")[1].isdigit() else 0)
        if not parts:
            raise SystemExit(f"no events_ file under {path}")
        return [os.path.join(path, p) for p in parts]
    return [path]


def human(n):
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024 or unit == "TB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{int(n)}B"
        n /= 1024


def read_lines(path):
    if path.endswith(".zstd") or path.endswith(".zst"):
        import subprocess
        p = subprocess.Popen(["zstd", "-dc", path],
                             stdout=subprocess.PIPE, text=True,
                             errors="replace")
        yield from p.stdout
        p.wait()
    else:
        yield from open(path, errors="replace")


def attribute(paths):
    stages = {}
    app_start = app_end = None
    for line in (ln for p in paths for ln in read_lines(p)):
        line = line.strip()
        if not line:
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event", "")
        if kind == "SparkListenerApplicationStart":
            app_start = ev.get("Timestamp")
        elif kind == "SparkListenerApplicationEnd":
            app_end = ev.get("Timestamp")
        elif kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si["Stage Attempt ID"])
            st = stages.setdefault(key, {
                "name": "", "tasks": 0,
                "run_ms": 0, "gc_ms": 0, "sr": 0, "sw": 0,
                "spill": 0, "input": 0})
            # assign, don't setdefault: TaskEnd events precede
            # StageCompleted, so the entry usually already exists with
            # name "" (r18 advice finding — every name printed blank)
            st["name"] = si.get("Stage Name", st["name"])
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            st["wall_ms"] = (comp - sub) if sub and comp else 0
            st["ntasks_spec"] = si.get("Number of Tasks", 0)
        elif kind == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            st = stages.setdefault(key, {
                "name": "", "tasks": 0, "run_ms": 0, "gc_ms": 0,
                "sr": 0, "sw": 0, "spill": 0, "input": 0,
                "wall_ms": 0, "ntasks_spec": 0})
            m = ev.get("Task Metrics") or {}
            st["tasks"] += 1
            st["run_ms"] += m.get("Executor Run Time", 0)
            st["gc_ms"] += m.get("JVM GC Time", 0)
            srm = m.get("Shuffle Read Metrics") or {}
            st["sr"] += srm.get("Local Bytes Read", 0) + \
                srm.get("Remote Bytes Read", 0)
            swm = m.get("Shuffle Write Metrics") or {}
            st["sw"] += swm.get("Shuffle Bytes Written", 0)
            st["spill"] += m.get("Memory Bytes Spilled", 0) + \
                m.get("Disk Bytes Spilled", 0)
            im = m.get("Input Metrics") or {}
            st["input"] += im.get("Bytes Read", 0)
    rows = sorted(stages.items(), key=lambda kv: -kv[1].get("wall_ms", 0))
    if app_start and app_end:
        print(f"app wall-clock: {(app_end - app_start) / 1e3:.1f}s")
    total_wall = sum(s.get("wall_ms", 0) for _, s in rows)
    total_run = sum(s["run_ms"] for _, s in rows)
    total_gc = sum(s["gc_ms"] for _, s in rows)
    print(f"stage wall sum: {total_wall / 1e3:.1f}s  task run sum: "
          f"{total_run / 1e3:.1f}s  gc sum: {total_gc / 1e3:.1f}s")
    print(f"{'stage':>8} {'wall_s':>8} {'tasks':>6} {'run_s':>9} "
          f"{'gc_s':>7} {'sh_read':>9} {'sh_write':>9} {'spill':>9} "
          f"{'input':>9}  name")
    for (sid, att), s in rows[:40]:
        print(f"{sid:>6}.{att} {s.get('wall_ms', 0) / 1e3:>8.1f} "
              f"{s['tasks']:>6} {s['run_ms'] / 1e3:>9.1f} "
              f"{s['gc_ms'] / 1e3:>7.1f} {human(s['sr']):>9} "
              f"{human(s['sw']):>9} {human(s['spill']):>9} "
              f"{human(s['input']):>9}  {s['name'][:60]}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    for p in sys.argv[1:]:
        print(f"=== {p}")
        attribute(log_files(p))
