"""Summarize a Spark event log: per-stage wall, task-time breakdown, and
driver-side gaps.

Answers the scaling question "where did the cores sit idle": for each
stage, reports wall span, summed executor run time, scheduler delay,
GC, python-UDF time, shuffle I/O time, and achieved concurrency
(task-time / wall). Driver gaps (wall not covered by any running stage)
are what AQE planning, driver collects, and Python driver code cost.

Usage: python tools/evlog_stats.py <eventlog file or rolling dir> [--min-wall 0.5]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys


def open_log(path):
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.startswith("events_")
        )
        path = os.path.join(path, files[0])
    if path.endswith(".zstd"):
        import pyarrow as pa

        return pa.CompressedInputStream(pa.OSFile(path), "zstd"), True
    return open(path, "rb"), False


def iter_events(path):
    stream, is_arrow = open_log(path)
    buf = b""
    while True:
        chunk = stream.read(1 << 20)
        if not chunk:
            break
        buf += chunk
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            if line.strip():
                yield json.loads(line)
    if buf.strip():
        yield json.loads(buf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--min-wall", type=float, default=0.5)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    stages = {}
    app_start = app_end = None
    for ev in iter_events(args.path):
        e = ev.get("Event", "")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si["Stage Attempt ID"])
            st = stages.setdefault(key, collections.Counter())
            st["submit"] = si.get("Submission Time", 0)
            st["complete"] = si.get("Completion Time", 0)
            st["ntask"] = si.get("Number of Tasks", 0)
            stages[key + ("name",)] = si.get("Stage Name", "")[:70]
        elif e == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            st = stages.setdefault(key, collections.Counter())
            ti = ev.get("Task Info", {})
            tm = ev.get("Task Metrics") or {}
            st["done"] += 1
            run = tm.get("Executor Run Time", 0)
            st["run"] += run
            st["cpu"] += tm.get("Executor CPU Time", 0) / 1e6  # ns -> ms
            st["gc"] += tm.get("JVM GC Time", 0)
            st["deser"] += tm.get("Executor Deserialize Time", 0)
            st["rser"] += tm.get("Result Serialization Time", 0)
            wall = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            st["sched_delay"] += max(
                0,
                wall
                - run
                - tm.get("Executor Deserialize Time", 0)
                - tm.get("Result Serialization Time", 0),
            )
            srm = tm.get("Shuffle Read Metrics") or {}
            st["sh_fetch"] += srm.get("Fetch Wait Time", 0)
            swm = tm.get("Shuffle Write Metrics") or {}
            st["sh_write"] += swm.get("Shuffle Write Time", 0) / 1e6
            for acc in ti.get("Accumulables", []):
                nm = acc.get("Name") or ""
                try:
                    v = int(acc.get("Update", 0))
                except (TypeError, ValueError):
                    continue
                if nm == "internal.metrics.python.totalTime" or "pythonUDF" in nm:
                    st["py"] += v

    rows = []
    spans = []
    for key, st in stages.items():
        if len(key) != 2 or not isinstance(st, collections.Counter):
            continue
        name = stages.get(key + ("name",), "")
        wall = (st["complete"] - st["submit"]) / 1e3
        if st["submit"]:
            spans.append((st["submit"], st["complete"]))
        if wall < args.min_wall:
            continue
        conc = (st["run"] / 1e3) / wall if wall > 0 else 0
        rows.append(
            (
                wall,
                f"s{key[0]:<4} w={wall:7.1f}s n={st['ntask']:<5} "
                f"run={st['run']/1e3:8.1f}s cpu={st['cpu']/1e3:8.1f}s "
                f"gc={st['gc']/1e3:6.1f}s sched={st['sched_delay']/1e3:7.1f}s "
                f"conc={conc:5.1f} {name}",
            )
        )
    rows.sort(reverse=True)
    for _, line in rows[: args.top]:
        print(line)

    # driver gaps: application wall not covered by any stage span
    spans.sort()
    covered = 0
    cur_s = cur_e = None
    merged = []
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                merged.append((cur_s, cur_e))
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        merged.append((cur_s, cur_e))
    covered = sum(e - s for s, e in merged) / 1e3
    if app_start and app_end:
        total = (app_end - app_start) / 1e3
        print(
            f"\napp wall={total:.1f}s stage-covered={covered:.1f}s "
            f"driver-gap={total - covered:.1f}s"
        )
        # largest individual gaps
        gaps = []
        prev = app_start
        for s, e in merged:
            if s > prev:
                gaps.append((s - prev, prev, s))
            prev = max(prev, e)
        if app_end > prev:
            gaps.append((app_end - prev, prev, app_end))
        gaps.sort(reverse=True)
        print("largest driver gaps (s, offset-from-start):")
        for g, s, _ in gaps[:15]:
            print(f"  {g/1e3:7.1f}s at +{(s-app_start)/1e3:8.1f}s")


if __name__ == "__main__":
    main()
