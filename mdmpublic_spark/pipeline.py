"""The end-to-end MDM record-linkage pipeline (SURVEY.md §7.1).

    pages ─extract→ extracted ─block→ blocked ─pairs→ pairs
          ─score→ scored/edges ─cluster→ clusters ─golden→ golden

Each stage is a checkpointed table commit (plans/runner.py) with
per-partition lineage counters (metrics.py); reruns skip completed
stages (resume semantics per north_rule).

Run it standalone (the spark-submit entry per north_rule):

    spark-submit --py-files mdmpublic_spark.zip -m mdmpublic_spark.pipeline \
        --pages /data/pages.parquet --work-dir /data/run1

Reference lifecycle being reproduced: REST ingest → staging bucket →
index-assisted candidate search → scoring pool → master-bucket golden
records, with every mutation audited (SURVEY.md §3.4).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from mdmpublic_spark.metrics import MetricsSink
from mdmpublic_spark.operators.blocking import block_keys, common_shingles
from mdmpublic_spark.operators.clustering import connected_components
from mdmpublic_spark.operators.extract import dedup_latest, extract_pages
from mdmpublic_spark.operators.golden import assign_clusters, golden_records
from mdmpublic_spark.operators.pairs import (
    DEFAULT_PREFIX_CAPS,
    PairGenStats,
    candidate_pairs,
)
from mdmpublic_spark.operators.scoring import DEFAULT_THRESHOLD, page_features, score_pairs
from mdmpublic_spark.plans.runner import StageRunner


@dataclass
class PipelineConfig:
    use_domain_keys: bool = True
    use_lsh_keys: bool = True
    min_stop_df: int = 20
    stop_frac: float = 0.005
    max_block_size: int = 2000
    broadcast_threshold: int = 200
    # per-key-family admission caps (see operators/pairs.py); None
    # disables family-specific tightening
    prefix_caps: dict | None = field(
        default_factory=lambda: dict(DEFAULT_PREFIX_CAPS)
    )
    score_threshold: float = DEFAULT_THRESHOLD
    title_chars: int = 80
    cc_max_iter: int = 25
    repartition: int | None = None  # pair/score parallelism override
    # path to a committed profile table to reuse instead of re-profiling
    # (profile pinning): incremental batches freeze the master profile so
    # blocking keys stay comparable across batches, and a full recompute
    # given the same frozen profile is the incremental path's equivalence
    # oracle (tests/test_incremental.py). None = profile this corpus.
    frozen_profile: str | None = None
    extra: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    work_dir: str,
    config: PipelineConfig | None = None,
    run_id: str | None = None,
) -> dict:
    import time as _time

    cfg = config or PipelineConfig()
    run_id = run_id or uuid.uuid4().hex[:8]
    metrics = MetricsSink(f"{work_dir}/metrics", run_id)
    runner = StageRunner(spark, work_dir, metrics)
    wall_t0 = _time.time()
    # per-stage fingerprint configs hold ONLY the knobs that stage reads,
    # so e.g. a threshold change re-runs nothing upstream of clustering
    #
    # Input parallelism: a small corpus may live in a single parquet file,
    # which Spark scans as ONE task (maxPartitionBytes splitting only helps
    # large files) — the whole extract/LSH map path would run on one core.
    # Explicitly spread the scan across the configured parallelism; on a
    # real cluster with many input files this repartition coalesces to a
    # no-op-sized shuffle relative to the UDF work it unlocks.
    par = cfg.repartition or int(spark.conf.get("spark.sql.shuffle.partitions"))
    raw = spark.read.parquet(pages_path).repartition(par)

    def _spread(df: DataFrame) -> DataFrame:
        """Guarantee map-side parallelism ≥ the cluster width for
        UDF-heavy consumers of a stage table. Parquet scans bin-pack
        small files (openCostInBytes), so a sandbox-scale table reads
        as a handful of splits no matter how many cores exist — the
        minhash/feature map stages then run 8-wide at any cluster size.
        At 100 TB the scan yields ≫cores splits and this is a no-op;
        the check is plan-time only (no job)."""
        width = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < width:
            return df.repartition(width)
        return df

    # 1. extract — deterministic html→text, newest capture per url
    extracted_t = runner.run_stage(
        "extract",
        lambda: dedup_latest(extract_pages(raw)),
        config={"src": pages_path},
    )
    extracted = _spread(extracted_t.read(spark))

    # 2a. profile — corpus-adaptive boilerplate ("stop shingles") by DF
    def _profile() -> DataFrame:
        if cfg.frozen_profile:
            from mdmpublic_spark.tables import Table

            return Table(cfg.frozen_profile).read(spark)
        return common_shingles(
            extracted,
            cfg.min_stop_df,
            cfg.stop_frac,
            n_docs=runner.state["extract"]["rows"],
        )

    profile_t = runner.run_stage(
        "profile",
        _profile,
        config={
            "min_stop_df": cfg.min_stop_df,
            "stop_frac": cfg.stop_frac,
            "frozen": cfg.frozen_profile,
        },
        inputs=[extracted_t],
    )
    # Zipf head only — small by construction; the 64-bit ids feed
    # blocking's JVM-side filter, the 32-bit ids feed scoring suppression
    prof_rows = profile_t.read(spark).select("h", "h32").collect()
    stop_hashes = [r["h"] for r in prof_rows]
    stop_hashes32 = [r["h32"] for r in prof_rows]
    metrics.add("profile", "stop_shingles", len(prof_rows))

    # 2b. block — multi-pass keys (domain + LSH bands over stopped shingles)
    blocked_t = runner.run_stage(
        "block",
        lambda: block_keys(
            extracted,
            use_domain=cfg.use_domain_keys,
            use_lsh=cfg.use_lsh_keys,
            stop_hashes=stop_hashes,
        ),
        config={"domain": cfg.use_domain_keys, "lsh": cfg.use_lsh_keys},
        inputs=[extracted_t, profile_t],
    )

    # 3. pairs — skew-aware block self-join
    pair_stats = PairGenStats()

    def _pairs() -> DataFrame:
        df = candidate_pairs(
            blocked_t.read(spark),
            max_block_size=cfg.max_block_size,
            broadcast_threshold=cfg.broadcast_threshold,
            stats=pair_stats,
            prefix_caps=cfg.prefix_caps,
        )
        return df.repartition(cfg.repartition) if cfg.repartition else df

    pairs_t = runner.run_stage(
        "pairs",
        _pairs,
        config={
            "max_block_size": cfg.max_block_size,
            "broadcast_threshold": cfg.broadcast_threshold,
            "repartition": cfg.repartition,
            "prefix_caps": cfg.prefix_caps,
        },
        inputs=[blocked_t],
    )
    metrics.add("pairs", "oversize_blocks", pair_stats.oversize_blocks)
    metrics.add("pairs", "dropped_pairs_est", pair_stats.dropped_pairs_est)
    metrics.add("pairs", "hot_blocks", pair_stats.hot_blocks)

    # 4a. features — narrow scoring projection, materialized ONCE: the
    # score join reads it twice (a/b sides); recomputing the hashed
    # shingle arrays per side doubled the stage's JVM work.
    features_t = runner.run_stage(
        "features",
        lambda: page_features(
            extracted, title_chars=cfg.title_chars, stop_hashes32=stop_hashes32
        ),
        config={"title_chars": cfg.title_chars},
        inputs=[extracted_t, profile_t],
    )

    # 4b. score — vectorized pairwise metrics; edges = score ≥ θ
    def _scored() -> DataFrame:
        scored, _ = score_pairs(
            pairs_t.read(spark), features_t.read(spark), threshold=cfg.score_threshold
        )
        return scored

    scored_t = runner.run_stage(
        "score",
        _scored,
        config={},
        inputs=[pairs_t, features_t],
    )

    # 5. cluster — large-star/small-star CC over match edges
    def _clusters() -> DataFrame:
        edges = (
            scored_t.read(spark)
            .where(F.col("score") >= cfg.score_threshold)
            .select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        )
        assign, rounds = connected_components(
            edges,
            max_iter=cfg.cc_max_iter,
            # scored rows upper-bound the edge count — lets CC pick the
            # union-find fast path without a sizing job when small
            edge_count=runner.state["score"]["rows"],
        )
        metrics.add("cluster", "cc_rounds", rounds)
        return assign

    clusters_t = runner.run_stage(
        "cluster",
        _clusters,
        config={"threshold": cfg.score_threshold, "max_iter": cfg.cc_max_iter},
        inputs=[scored_t],
    )

    # 6. golden — full assignment (singletons included) + survivorship
    def _golden() -> DataFrame:
        clustered = assign_clusters(extracted, clusters_t.read(spark))
        return golden_records(clustered)

    golden_t = runner.run_stage("golden", _golden, config={}, inputs=[clusters_t, extracted_t])

    wall = _time.time() - wall_t0
    metrics.flush(spark)
    return {
        "run_id": run_id,
        "work_dir": work_dir,
        "ran": runner.ran,
        "skipped": runner.skipped,
        "wall_seconds": round(wall, 3),
        "stage_seconds": runner.timings,
        "rows": {s: runner.state[s]["rows"] for s in runner.state},
        "pair_stats": vars(pair_stats),
        "tables": {
            "extracted": extracted_t.path,
            "profile": profile_t.path,
            "blocked": blocked_t.path,
            "pairs": pairs_t.path,
            "features": features_t.path,
            "scored": scored_t.path,
            "clusters": clusters_t.path,
            "golden": golden_t.path,
        },
    }


def main() -> None:
    import argparse
    import json

    from mdmpublic_spark.session import get_spark

    ap = argparse.ArgumentParser(description="MDM record-linkage pipeline")
    ap.add_argument("--pages", required=True, help="pages parquet path")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--threshold", type=float, default=DEFAULT_THRESHOLD)
    ap.add_argument("--max-block-size", type=int, default=2000)
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="run the whole pipeline once into a throwaway dir first, so the "
        "reported timings reflect a warm JVM (long-lived cluster app), not "
        "first-run JIT compilation",
    )
    ap.add_argument(
        "--warmup-pages",
        default=None,
        help="corpus for the warmup pass (default: the --pages corpus). A "
        "small corpus warms JIT, codegen caches and Python workers at a "
        "fraction of a full-input warmup's cost",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="mdm-pipeline", master=args.master)
    cfg = PipelineConfig(score_threshold=args.threshold, max_block_size=args.max_block_size)
    if args.warmup or args.warmup_pages:
        import shutil
        import tempfile

        wdir = tempfile.mkdtemp(prefix="mdm-warmup-")
        run_pipeline(spark, args.warmup_pages or args.pages, wdir, cfg)
        shutil.rmtree(wdir, ignore_errors=True)
    print(json.dumps(run_pipeline(spark, args.pages, args.work_dir, cfg)))


if __name__ == "__main__":
    main()
