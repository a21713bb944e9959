"""Summarize a Spark event log: per-stage wall, task-time breakdown, skew.

The scaling work (BENCH.md) needs to know WHERE core-seconds go when the
same job runs at different parallelism levels — GC, shuffle, Python
crossings, scheduler gaps — not just per-stage walls. Spark's event log
records every task's metrics; this tool aggregates them per stage.

Usage:
    python tools/evlog_summary.py /tmp/mdm-evlog/<app-id> [--top 15] [--json]

Columns (all seconds unless noted):
    wall     stage wall clock (last task end - first task launch)
    tasksum  sum of executor run time across tasks (core-seconds)
    gc       sum of JVM GC time attributed to the stage's tasks
    fetch    shuffle-read fetch wait (blocked on remote/local fetch)
    swrite   shuffle-write time
    deser    task deserialization + result serialization
    sched    scheduler delay (launch->start + finish->result, derived)
    skew     max task run time / mean task run time
"""

from __future__ import annotations

import argparse
import gzip
import io
import json
import os
import shutil
import subprocess
from collections import defaultdict


def _open_text(f: str):
    if f.endswith(".gz"):
        return gzip.open(f, "rt", errors="replace")
    if f.endswith(".zstd") or f.endswith(".zst"):
        # no zstandard module in the sandbox; the zstd CLI decodes Spark's
        # frame-streamed compressed event logs fine
        zstd = shutil.which("zstd")
        if not zstd:
            raise RuntimeError("zstd CLI not found for compressed event log")
        p = subprocess.run([zstd, "-dc", f], capture_output=True, check=True)
        return io.StringIO(p.stdout.decode("utf-8", errors="replace"))
    return open(f, "rt", errors="replace")


def iter_events(path: str):
    if os.path.isdir(path):
        # rolling (eventlog_v2) dirs hold events_* parts + an appstatus marker
        entries = [os.path.join(path, f) for f in sorted(os.listdir(path))]
        files = [
            f
            for f in entries
            if os.path.isfile(f) and not os.path.basename(f).startswith("appstatus")
        ]
    else:
        files = [path]
    for f in files:
        with _open_text(f) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(ev, dict):
                    yield ev


def summarize(path: str) -> list[dict]:
    stages: dict[tuple, dict] = {}
    tasks = defaultdict(list)
    for ev in iter_events(path):
        kind = ev.get("Event")
        if kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si["Stage Attempt ID"])
            stages[key] = {
                "stage": si["Stage ID"],
                "name": si["Stage Name"].split(" at ")[0][:40],
                "site": si["Stage Name"].split(" at ")[-1][:48],
                "ntask": si["Number of Tasks"],
                "submit": si.get("Submission Time"),
                "complete": si.get("Completion Time"),
            }
        elif kind == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            ti = ev.get("Task Info", {})
            tm = ev.get("Task Metrics") or {}
            sr = tm.get("Shuffle Read Metrics") or {}
            sw = tm.get("Shuffle Write Metrics") or {}
            tasks[key].append(
                {
                    "launch": ti.get("Launch Time", 0),
                    "finish": ti.get("Finish Time", 0),
                    "run": tm.get("Executor Run Time", 0),
                    "gc": tm.get("JVM GC Time", 0),
                    "deser": tm.get("Executor Deserialize Time", 0)
                    + tm.get("Result Serialization Time", 0),
                    "fetch": sr.get("Fetch Wait Time", 0),
                    "swrite": sw.get("Shuffle Write Time", 0) / 1e6,  # ns -> ms
                    "sread_b": sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0),
                    "swrite_b": sw.get("Shuffle Bytes Written", 0),
                    "input_b": (tm.get("Input Metrics") or {}).get("Bytes Read", 0),
                    "cpu_ns": tm.get("Executor CPU Time", 0),
                }
            )
    out = []
    for key, st in stages.items():
        ts = tasks.get(key, [])
        if not ts:
            continue
        runs = [t["run"] for t in ts]
        wall = (max(t["finish"] for t in ts) - min(t["launch"] for t in ts)) / 1e3
        tasksum = sum(runs) / 1e3
        span = (
            (st["complete"] - st["submit"]) / 1e3
            if st.get("complete") and st.get("submit")
            else wall
        )
        out.append(
            {
                **{k: st[k] for k in ("stage", "name", "site", "ntask")},
                "wall": round(wall, 2),
                "span": round(span, 2),
                "taskseconds": round(tasksum, 2),
                "cpuseconds": round(sum(t["cpu_ns"] for t in ts) / 1e9, 2),
                "gc": round(sum(t["gc"] for t in ts) / 1e3, 2),
                "fetch": round(sum(t["fetch"] for t in ts) / 1e3, 2),
                "swrite": round(sum(t["swrite"] for t in ts) / 1e3, 2),
                "deser": round(sum(t["deser"] for t in ts) / 1e3, 2),
                "sread_gb": round(sum(t["sread_b"] for t in ts) / 2**30, 3),
                "swrite_gb": round(sum(t["swrite_b"] for t in ts) / 2**30, 3),
                "input_gb": round(sum(t["input_b"] for t in ts) / 2**30, 3),
                "skew": round(max(runs) / (sum(runs) / len(runs)), 1) if sum(runs) else 0.0,
            }
        )
    out.sort(key=lambda r: -r["taskseconds"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="event log file or directory")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    rows = summarize(args.path)
    total_run = sum(r["taskseconds"] for r in rows)
    total_gc = sum(r["gc"] for r in rows)
    if args.json:
        print(json.dumps({"stages": rows[: args.top], "total_taskseconds": total_run,
                          "total_gc": total_gc}))
        return
    print(f"total task-seconds {total_run:.1f}   GC {total_gc:.1f} "
          f"({100 * total_gc / max(total_run, 1e-9):.1f}%)   stages {len(rows)}")
    hdr = ("stage", "ntask", "wall", "span", "tasksec", "cpusec", "gc", "fetch",
           "swrite", "deser", "skew", "sreadGB", "swriteGB", "site")
    print(("{:>6} {:>6} {:>8} {:>8} {:>9} {:>9} {:>7} {:>7} {:>7} {:>7} {:>5}"
           " {:>8} {:>8}  {}").format(*hdr))
    for r in rows[: args.top]:
        print(
            "{stage:>6} {ntask:>6} {wall:>8.1f} {span:>8.1f} {taskseconds:>9.1f} "
            "{cpuseconds:>9.1f} {gc:>7.1f} {fetch:>7.1f} {swrite:>7.1f} "
            "{deser:>7.1f} {skew:>5.1f} {sread_gb:>8.2f} {swrite_gb:>8.2f}  "
            "{site}".format(**r)
        )


if __name__ == "__main__":
    main()
