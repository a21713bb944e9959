"""Incremental-batch cost benchmark: delta fold-in vs full re-link.

The scale claim behind mdmpublic_spark/incremental.py is that folding a
delta crawl into a completed master costs ~O(delta × touched blocks),
not O(corpus). This tool measures exactly that on one warm session:

  1. full pipeline over the BASE corpus (the bootstrap),
  2. incremental_update folding a 1-in-K url-hash delta slice,
  3. full pipeline over BASE ∪ DELTA (what the batch replaced).

All three run in the same JVM at the same parallelism (in-process
`get_spark`, warmed on a small corpus first), so the comparison isolates
the work each path schedules — the N-vs-4N spark-submit protocol for
the BASELINE scaling rule lives in tools/bench_scaling.py, not here.

Prints one JSON line; --report appends a markdown row to BENCH.md.

Usage: python tools/bench_incremental.py [--n-pages 240000] [--delta-denom 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import ensure_corpus  # noqa: E402

from mdmpublic_spark.incremental import incremental_update  # noqa: E402
from mdmpublic_spark.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from mdmpublic_spark.session import get_spark  # noqa: E402


def ensure_split(spark, n_pages: int, denom: int) -> tuple[str, str, str, int, int]:
    """Deterministic url-hash split of the cached corpus into
    base / delta / union parquet (cached alongside the corpus)."""
    from pyspark.sql import functions as F

    d = f"/tmp/mdm_inc_split_{n_pages}_{denom}"
    meta = os.path.join(d, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            m = json.load(f)
        return (
            os.path.join(d, "base.parquet"),
            os.path.join(d, "delta.parquet"),
            os.path.join(d, "union.parquet"),
            m["n_base"],
            m["n_delta"],
        )
    corpus = ensure_corpus(n_pages)
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    in_delta = F.pmod(F.xxhash64("url"), F.lit(denom)) == 0
    base = pages.where(~in_delta)
    delta = pages.where(in_delta)
    os.makedirs(d, exist_ok=True)
    base.write.mode("overwrite").parquet(os.path.join(d, "base.parquet"))
    delta.write.mode("overwrite").parquet(os.path.join(d, "delta.parquet"))
    # union = the original corpus, but rewritten so all three inputs have
    # identical file/row-group geometry (scan parallelism parity)
    pages.write.mode("overwrite").parquet(os.path.join(d, "union.parquet"))
    n_base = base.count()
    n_delta = delta.count()
    with open(meta, "w") as f:
        json.dump({"n_base": n_base, "n_delta": n_delta}, f)
    return (
        os.path.join(d, "base.parquet"),
        os.path.join(d, "delta.parquet"),
        os.path.join(d, "union.parquet"),
        n_base,
        n_delta,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=240000)
    ap.add_argument("--delta-denom", type=int, default=16,
                    help="delta = 1-in-K url-hash slice of the corpus")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--warmup-pages", type=int, default=20000)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="mdm-bench-incremental", master=args.master)
    base_p, delta_p, union_p, n_base, n_delta = ensure_split(
        spark, args.n_pages, args.delta_denom
    )

    bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR") or (
        "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    )

    def workdir(tag: str) -> str:
        return tempfile.mkdtemp(prefix=f"mdm-incbench-{tag}-", dir=bench_dir)

    # warm JIT/codegen/Python workers outside the measured walls
    warm_corpus = ensure_corpus(args.warmup_pages)
    warm_dir = workdir("warm")
    run_pipeline(spark, os.path.join(warm_corpus, "pages.parquet"), warm_dir,
                 PipelineConfig())
    shutil.rmtree(warm_dir, ignore_errors=True)

    wd_master = workdir("base")
    info_base = run_pipeline(spark, base_p, wd_master, PipelineConfig())
    t0 = time.time()
    info_inc = incremental_update(spark, delta_p, wd_master, PipelineConfig())
    wall_inc = time.time() - t0
    wd_full = workdir("full")
    info_full = run_pipeline(spark, union_p, wd_full, PipelineConfig())

    out = {
        "metric": "incremental_vs_full",
        "n_base": n_base,
        "n_delta": n_delta,
        "delta_frac": round(n_delta / (n_base + n_delta), 4),
        "wall_base_bootstrap": info_base["wall_seconds"],
        "wall_incremental": round(wall_inc, 3),
        "wall_full_relink": info_full["wall_seconds"],
        "full_over_incremental": round(info_full["wall_seconds"] / wall_inc, 2),
        "inc_stage_seconds": info_inc["stage_seconds"],
        "full_stage_seconds": info_full["stage_seconds"],
        "delta_pairs": info_inc["delta_pairs"],
        "grandfathered_blocks": info_inc["pair_stats"]["grandfathered_blocks"],
        "master": args.master,
    }
    print(json.dumps(out))
    shutil.rmtree(wd_master, ignore_errors=True)
    shutil.rmtree(wd_full, ignore_errors=True)

    if args.report:
        with open(args.report, "a") as f:
            f.write(
                f"\n| {n_base:,} + {n_delta:,} ({out['delta_frac']:.1%}) "
                f"| {out['wall_full_relink']:.1f} | {out['wall_incremental']:.1f} "
                f"| **{out['full_over_incremental']:.1f}×** | {args.master} |\n"
            )


if __name__ == "__main__":
    main()
