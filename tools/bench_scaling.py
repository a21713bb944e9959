"""N-vs-4N scaling study (the BASELINE.json two-cluster-size rule).

No multi-node cluster exists in this sandbox, so — per the round brief —
the rule's scaling criterion is evidenced by running the IDENTICAL
pipeline job on the IDENTICAL input at two parallelism levels
(default local[8] vs local[32], i.e. N and 4N cores), launched the way
the north_rule prescribes: ``spark-submit --py-files <pkg.zip>``.

Throughput = pages / pipeline wall-seconds (stage execution only; JVM +
session startup excluded — on a real cluster that cost is paid once per
long-lived application, not per job).

Scaling efficiency = (T_N / T_4N) / 4.

The sandbox is a shared VM: hypervisor steal spikes showed 3x wall-time
swings between identical runs, so each configuration runs ``--repeats``
times and the MINIMUM wall (least-disturbed run) is scored; per-run
walls and the steal-time share measured from /proc/stat are reported
alongside so the noise is visible, not hidden. Steal alone is not
enough — one measured afternoon the guest's pure-ALU 2->8 scaling
ceiling fell to 0.708 (vs 0.989 clean) with steal <=1.5% — so each
batch also brackets itself with a busy-loop host-ceiling probe
(tools/cpu_capacity.py's workload) and records pre/post readings in the
output JSON: a batch whose ceiling reads well below ~0.95 ran on a
degraded host and its walls can only add noise, never minima.

Usage:  python tools/bench_scaling.py [--n-pages 120000] [--repeats 3] [--report BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def host_cpu_ceiling(small: int, big: int, seconds: float = 2.0, repeats: int = 2) -> float:
    """The machine's own N->4N scaling ceiling right now: best-of pure-ALU
    busy-loop throughput at ``big`` pinned procs over ``small``, normalized
    by the core ratio. No job of any kind can scale better than this."""
    from cpu_capacity import measure

    c_small = max(measure(small, seconds, "cpu") for _ in range(repeats)) / seconds
    c_big = max(measure(big, seconds, "cpu") for _ in range(repeats)) / seconds
    # clamp: a hard ceiling cannot exceed 1.0 — best-of-2 noise on a 2s
    # probe occasionally reads slightly above (observed 1.012)
    return round(min(1.0, c_big / c_small / (big / small)), 3)


def host_mem_ceiling(
    small: int, big: int, mem_mb: int, mode: str = "mem",
    seconds: float = 3.0, repeats: int = 2,
) -> float:
    """The machine's N->4N ceiling for MEMORY-bound work at a working set
    MATCHED to the job under test's per-task footprint (pass the measured
    number, don't assume 256 MB): best-of streaming-sum (``mem``) or
    random-gather (``memrand``) throughput at ``big`` pinned procs over
    ``small``, normalized by the core ratio. A pipeline whose hot stages
    stream/shuffle data cannot scale past this on a single socket."""
    from cpu_capacity import measure

    c_small = max(measure(small, seconds, mode, mem_mb) for _ in range(repeats)) / seconds
    c_big = max(measure(big, seconds, mode, mem_mb) for _ in range(repeats)) / seconds
    return round(min(1.0, c_big / c_small / (big / small)), 3)


def ensure_corpus(n_pages: int) -> str:
    d = f"/tmp/mdm_scale_corpus_{n_pages}"
    if not os.path.exists(os.path.join(d, "pages.parquet")):
        from mdmpublic_spark.gen.synth import generate_corpus

        t0 = time.time()
        stats = generate_corpus(d, n_pages=n_pages)
        print(f"# generated corpus {stats} in {time.time()-t0:.1f}s", file=sys.stderr)
    return d


def read_cpu_ticks() -> dict:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    keys = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return dict(zip(keys, (int(x) for x in parts[1 : len(keys) + 1])))


def steal_share(before: dict, after: dict) -> float:
    d = {k: after[k] - before[k] for k in before}
    total = sum(d.values()) or 1
    return d["steal"] / total


def run_once(
    pages: str,
    master: str,
    pkg_zip: str,
    warmup_pages: str | None = None,
    pin_cpus: int | None = None,
    timeout: int = 3600,
) -> dict:
    # work tables on the RAM-backed tmpfs for the same reason get_spark
    # puts spark.local.dir there (mdmpublic_spark/session.py:_local_dir):
    # on a real cluster the data plane (HDFS/S3) scales with the cluster;
    # this VM's single virtio disk does not — 32 concurrent writers
    # collapse its I/O queue and the measurement stops being about Spark.
    bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR") or (
        "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    )
    work = tempfile.mkdtemp(prefix="mdm-scale-", dir=bench_dir)
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    # Pin the WHOLE application (JVM task threads + Python UDF workers +
    # GC) to exactly `pin_cpus` cores. Without pinning, a local[8] run on
    # a 32-core box lets its 8 Python workers ride the 24 idle cores —
    # the "small cluster" silently uses ~2x its share, understating true
    # scaling. "Cluster of N" means N cores of machine, not N task slots.
    pin = ["taskset", "-c", f"0-{pin_cpus - 1}"] if pin_cpus else []
    # Memory scales WITH the core budget (default 2 GB/core): the rule under
    # test is "N executors vs 4N executors", and 4N executors bring 4x the
    # total heap — same-heap-at-both-levels would model a cluster whose
    # nodes lose 3/4 of their RAM when you add machines. Measured: with a
    # fixed 16g heap the 8 GB score-stage shuffle sort got 754 MB/task at
    # 8 concurrent tasks but 163 MB/task at 32 → spill + memory-acquire
    # stalls only at the bigger "cluster", poisoning the comparison.
    cores = pin_cpus or 32
    mem_per_core = os.environ.get("SPARK_GRAFT_MEM_PER_CORE", "2")
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{int(cores) * int(mem_per_core)}g")
    # Fixed-size heap + throughput GC. This VM's RAM is thin-provisioned
    # by the hypervisor: every first-touched guest page pays a host-side
    # fault, and those faults contend brutally at high core counts — CPU
    # sampling showed 56-96% of ALL cpu in kernel/sys time while G1 grew,
    # uncommitted and re-committed heap across stages. AlwaysPreTouch
    # pays the whole fault bill once at JVM start (outside the measured
    # stage walls — a cluster executor pays it once per process lifetime),
    # -Xms=-Xmx stops commit churn so it never recurs, and ParallelGC
    # never uncommits and measured 3x faster on the score stage's
    # Arrow-buffer churn than G1 (35.8s vs 102.9s, 480k pages, local[32]).
    # Measured A/B at 480k/local[32], stage wall: default G1 383s;
    # Xms+PGC without pretouch 360s (faults just move into the stages);
    # Xms+pretouch+PGC 175s. On a real non-thin-provisioned cluster the
    # same flags are standard batch-executor tuning
    # (spark.executor.extraJavaOptions) with a milder effect.
    jvm_opts = os.environ.get(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        f"-Xms{driver_mem} -XX:+AlwaysPreTouch -XX:+UseParallelGC",
    )
    # extra submit confs (e.g. event logging for a per-stage byte audit):
    # SPARK_GRAFT_EXTRA_SUBMIT_CONF="spark.eventLog.enabled=true;spark.eventLog.dir=file:/tmp/evlog"
    extra_confs: list[str] = []
    for kv in filter(None, os.environ.get("SPARK_GRAFT_EXTRA_SUBMIT_CONF", "").split(";")):
        extra_confs += ["--conf", kv.strip()]
    cmd = pin + [
        spark_submit,
        "--master", master,
        "--py-files", pkg_zip,
        # driver JVM options must be on the submit command line — builder
        # config is too late once the JVM exists
        "--driver-memory", driver_mem,
        "--conf", f"spark.driver.extraJavaOptions={jvm_opts}",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.log.level=WARN",
        *extra_confs,
        os.path.join(REPO, "mdmpublic_spark", "pipeline.py"),
        "--pages", pages,
        "--work-dir", work,
        "--master", master,
        # report warm-JVM timings (long-lived app steady state); a small
        # warmup corpus warms JIT/codegen/Python workers without paying a
        # full-input pass per measurement
        "--warmup-pages", warmup_pages or pages,
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=timeout)
        last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not last:
            raise RuntimeError(
                f"pipeline produced no JSON:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
            )
        return json.loads(last[-1])
    finally:
        # also reached when the leg dies (OOM-killed JVM, timeout): the
        # work tables must not keep occupying the RAM-backed tmpfs
        shutil.rmtree(work, ignore_errors=True)


def sweep_orphaned_scratch() -> int:
    """Remove spark.local.dir leftovers from dead JVMs.

    A cleanly exiting JVM removes its blockmgr-*/spark-* scratch via
    shutdown hook; an OOM-KILLED one cannot, and on the RAM-backed tmpfs
    those orphans ARE occupied memory — the 7.68M-page local[8] leg was
    OOM-killed at 86 GB of orphanable scratch + a 16 GB pre-touched heap.
    Safe between this tool's serial legs (no other Spark app should share
    the scratch dir while a batch runs). Returns bytes freed."""
    base = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or "/dev/shm/mdm-spark-local"
    freed = 0
    if not os.path.isdir(base):
        return 0
    for name in os.listdir(base):
        p = os.path.join(base, name)
        try:
            freed += sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )
        except OSError:
            pass
        shutil.rmtree(p, ignore_errors=True)
    return freed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=120000)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--big", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-pin", dest="pin", action="store_false", default=True,
                    help="don't taskset-pin each config to its core budget")
    ap.add_argument("--warmup-pages", type=int, default=20000,
                    help="size of the small warmup corpus (0 = warm up on the full input)")
    ap.add_argument("--report", default=None, help="markdown file to append the table to")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-run subprocess timeout in seconds (raise for multi-M-page inputs)")
    ap.add_argument("--mem-probe-mb", type=int, default=0,
                    help="if >0, also bracket the batch with matched-footprint "
                         "memory-bandwidth ceilings (mem + memrand at this "
                         "per-process working set) — pass the measured per-task "
                         "footprint of the job under test")
    args = ap.parse_args()

    from mdmpublic_spark.session import package_zip

    pkg = package_zip()
    corpus = ensure_corpus(args.n_pages)
    pages = os.path.join(corpus, "pages.parquet")
    warmup = None
    if args.warmup_pages and args.warmup_pages < args.n_pages:
        warmup = os.path.join(ensure_corpus(args.warmup_pages), "pages.parquet")

    pre_ceiling = host_cpu_ceiling(args.small, args.big)
    print(f"# host ALU ceiling {args.small}->{args.big} (pre): {pre_ceiling}", file=sys.stderr)
    pre_mem = post_mem = None
    if args.mem_probe_mb:
        pre_mem = {
            mode: host_mem_ceiling(args.small, args.big, args.mem_probe_mb, mode)
            for mode in ("mem", "memrand")
        }
        print(
            f"# host mem ceiling {args.small}->{args.big} @{args.mem_probe_mb}MB "
            f"(pre): {pre_mem}", file=sys.stderr,
        )
    if pre_ceiling < 0.9:
        print(
            "# WARNING: degraded host window — no process can scale past this "
            "ceiling right now; this batch's walls cannot set new minima",
            file=sys.stderr,
        )

    # interleave configs (rep-major) so slow ambient-noise drift on the
    # shared VM hits both parallelism levels evenly instead of whichever
    # config happened to run during the noisy window
    acc = {c: {"walls": [], "steals": [], "best": None} for c in (args.small, args.big)}
    for rep in range(args.repeats):
        for cores in (args.small, args.big):
            t0 = read_cpu_ticks()
            try:
                info = run_once(
                    pages,
                    f"local[{cores}]",
                    pkg,
                    warmup_pages=warmup,
                    pin_cpus=cores if args.pin else None,
                    timeout=args.timeout,
                )
            except Exception as exc:  # noqa: BLE001 — a dead leg must not
                # kill the batch: the other leg's walls are still evidence
                freed = sweep_orphaned_scratch()
                print(
                    f"# local[{cores}] rep {rep}: FAILED ({type(exc).__name__}: "
                    f"{str(exc)[:300]}); swept {freed >> 20} MB of orphaned "
                    f"scratch; continuing",
                    file=sys.stderr,
                )
                continue
            st = steal_share(t0, read_cpu_ticks())
            a = acc[cores]
            a["walls"].append(info["wall_seconds"])
            a["steals"].append(round(st, 4))
            if a["best"] is None or info["wall_seconds"] < a["best"]["wall_seconds"]:
                a["best"] = info
            print(
                f"# local[{cores}] rep {rep}: {info['wall_seconds']:.1f}s "
                f"(steal {st:.1%})",
                file=sys.stderr,
            )
    failed = [c for c in (args.small, args.big) if acc[c]["best"] is None]
    if failed:
        print(
            f"# batch incomplete: no successful rep at local{failed} — "
            "walls above are still published; no efficiency computed",
            file=sys.stderr,
        )
        sys.exit(1)
    results = {}
    for cores in (args.small, args.big):
        best = acc[cores]["best"]
        wall = best["wall_seconds"]
        results[cores] = {
            "wall_seconds": wall,
            "pages_per_sec": round(args.n_pages / wall, 1),
            "stage_seconds": best["stage_seconds"],
            "all_walls": acc[cores]["walls"],
            "steal_shares": acc[cores]["steals"],
        }
        print(f"# local[{cores}]: best {wall:.1f}s  {results[cores]['pages_per_sec']} pages/s",
              file=sys.stderr)

    post_ceiling = host_cpu_ceiling(args.small, args.big)
    print(f"# host ALU ceiling {args.small}->{args.big} (post): {post_ceiling}", file=sys.stderr)
    if args.mem_probe_mb:
        post_mem = {
            mode: host_mem_ceiling(args.small, args.big, args.mem_probe_mb, mode)
            for mode in ("mem", "memrand")
        }
        print(
            f"# host mem ceiling {args.small}->{args.big} @{args.mem_probe_mb}MB "
            f"(post): {post_mem}", file=sys.stderr,
        )
    if post_ceiling < 0.9:
        # the window can also collapse MID-batch (observed pre 0.949 ->
        # post 0.874) — flag it the same way, not just record it
        print(
            "# WARNING: degraded host window at batch END — the window "
            "collapsed mid-run; this batch's walls cannot set new minima",
            file=sys.stderr,
        )

    t_small = results[args.small]["wall_seconds"]
    t_big = results[args.big]["wall_seconds"]
    ratio = args.big / args.small
    efficiency = (t_small / t_big) / ratio
    summary = {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": f"speedup/(cores ratio {ratio:.0f}x)",
        "n_pages": args.n_pages,
        "host_alu_ceiling": {"pre": pre_ceiling, "post": post_ceiling},
        "runs": {f"local[{c}]": v for c, v in results.items()},
    }
    if args.mem_probe_mb:
        summary["host_mem_ceiling"] = {
            "mem_mb": args.mem_probe_mb, "pre": pre_mem, "post": post_mem,
        }
    print(json.dumps(summary))

    if args.report:
        rs, rb = results[args.small], results[args.big]
        with open(args.report, "a") as f:
            f.write(
                f"\n## Scaling study (N vs {ratio:.0f}N cores, {args.n_pages} pages, "
                f"same input, spark-submit --py-files)\n\n"
                f"| parallelism | pipeline wall (s) | pages/sec | all runs (s) | steal share |\n"
                f"|---|---|---|---|---|\n"
                f"| local[{args.small}] | {t_small:.1f} | {rs['pages_per_sec']} | "
                f"{', '.join(f'{w:.1f}' for w in rs['all_walls'])} | "
                f"{', '.join(f'{s:.1%}' for s in rs['steal_shares'])} |\n"
                f"| local[{args.big}] | {t_big:.1f} | {rb['pages_per_sec']} | "
                f"{', '.join(f'{w:.1f}' for w in rb['all_walls'])} | "
                f"{', '.join(f'{s:.1%}' for s in rb['steal_shares'])} |\n\n"
                f"**Scaling efficiency (speedup / {ratio:.0f}) = {efficiency:.3f}**"
                f" (target ≥ 0.8 per BASELINE.json). Best-of-{args.repeats} walls "
                f"scored; the sandbox shares hardware (nonzero steal), so minima "
                f"are the least-disturbed measurements.\n"
            )


if __name__ == "__main__":
    main()
