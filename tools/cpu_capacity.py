"""Measure this machine's effective parallel CPU capacity curve.

Runs an embarrassingly parallel, shuffle-free, allocation-free busy loop
at several process counts (each pool pinned to that many cores, mirroring
how bench_scaling.py pins Spark) and reports total throughput per level.

Why this exists: the sandbox VM advertises 32 vCPUs, but per-core speed
drops as occupancy rises (hypervisor frequency scaling / host sharing).
The curve gives the *hardware ceiling* on any N→4N scaling measurement:
no job — Spark or otherwise — can beat C(4N)/C(N), where C(n) is the
busy-loop throughput with n pinned processes. BENCH.md cites this when
choosing which N→4N pair can evidence the ≥0.8 efficiency rule at all.

Two workloads:
  * ``cpu`` — pure-ALU busy loop (tiny working set, no memory traffic);
  * ``mem`` — streaming sums over a 256 MB numpy array (the shape of
    Arrow-batch / shuffle work, which is what the pipeline's hot stages
    actually do). A machine can scale the first and saturate on the
    second — DRAM bandwidth is shared across cores.

Usage: python tools/cpu_capacity.py [--mode cpu|mem] [--levels 1,2,4,8,16,32] [--seconds 3]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _burn(args):
    core, seconds, mode = args
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    if mode == "mem":
        import numpy as np

        a = np.arange(32 * 1024 * 1024, dtype=np.float64)  # 256 MB stream
        t = time.time()
        x = 0
        while time.time() - t < seconds:
            x += int(a.sum()) & 1  # one full DRAM pass per iteration
            x += 32 * 1024 * 1024  # count elements streamed
        return x
    t = time.time()
    x = 0
    while time.time() - t < seconds:
        x += 1
    return x


def measure(procs: int, seconds: float, mode: str) -> int:
    with mp.Pool(procs) as pool:
        return sum(pool.map(_burn, [(i, seconds, mode) for i in range(procs)]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="cpu", choices=["cpu", "mem"])
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    curve = {}
    for n in levels:
        best = max(measure(n, args.seconds, args.mode) for _ in range(args.repeats))
        curve[n] = best / args.seconds
        print(
            f"# procs={n:3d} total={curve[n]/1e6:7.1f}M iters/s "
            f"per_proc={curve[n]/n/1e6:6.2f}M",
            flush=True,
        )
    out = {"metric": f"{args.mode}_capacity_curve", "iters_per_sec": curve, "ceilings": {}}
    for a in levels:
        b = a * 4
        if b in curve:
            out["ceilings"][f"{a}->{b}"] = round(curve[b] / curve[a] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
