"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is forced
end-to-end with the noop sink (full computation, no driver collect
bottleneck). The ER dedup query runs the complete blocking + scoring +
clustering pass over the documents table.

Before timing, every headline query runs once at sf0.001 (WARMUP_SF_DIR)
to warm JIT/codegen/Python-worker pools: the numbers then measure
steady-state query cost, not one-time JVM startup — the regime a
long-lived application on a real cluster actually runs in. Set
SPARK_GRAFT_NO_WARMUP=1 to skip (cold-session mode).

The N-vs-4N scaling study (BASELINE rule) lives in
tools/bench_scaling.py and reports into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mdmpublic_spark.queries import registry  # noqa: E402
from mdmpublic_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "j1_broadcast_lookup",
    "j_anti_joins",           # r2 name: j3_anti_join (+ j4, merged registry entry)
    "j9_asof_span",
    "a_rollup_buckets",       # r2 name: a8_time_buckets (+ a7)
    "w_window_family",        # r2 names: w1_lag_interval + w3_latest_per_group (+ w2/w5)
    "dd_minhash_pairs",       # oracle config: 64 bands × 1 row (recall-1)
    "dd_minhash_production",  # production config: LSH_BANDS×LSH_ROWS (21×3) — the
                              # path real users run, regression-tracked per VERDICT r2
    "ta_text_profile",        # r2 name: ta_token_stats (+ language_id, quality)
    "dd_span_dedup",          # corpus-wide span dedup (C4 family) — tracks the
                              # int64-keyed count join + reassembly path
    "ann_exact_topk",         # r2 name: ann_brute_force_topk (+ ivf full probe)
    "er_dedup_cluster_summary",
    "er_dedup_cosine",        # same flagship pipeline + the embedding-cosine
                              # cascade term (partial coverage at sf0.1 by
                              # design — exercises the left-join/coalesce arm)
    "er_cc_jaccard_clusters", # exact-Jaccard edges (prefix-filtered posting
                              # join) + the distributed large-star/small-star
                              # CC loop — was excluded at ~355s pre prefix
                              # filter; 21.5s after, so it joins the headline
    "er_link_sources",        # staging→master cross-source R-S linkage join
                              # (prefix-filtered, no same-side pairs) — the
                              # MDM promotion match, regression-tracked
]


def _dd_minhash_production(spark, sf_dir):
    """MinHash-LSH at the pipeline's production banding (21 bands × 3
    rows, token verify at 0.5) — not a registry entry (the approximate
    band config has no exact SQL oracle; dd_minhash_pairs checks the
    same machinery at the recall-1 config), but benchmarked so the
    configuration users actually run is visible round over round."""
    from mdmpublic_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, threshold=0.5, verify="token")


def _er_dedup_cosine(spark, sf_dir):
    """The flagship ER pipeline with the optional embedding-cosine
    cascade term enabled (scoring.score_pairs embeddings/w_cos) — the
    VERDICT-r2 item: the built arm is now exercised and benchmarked."""
    from mdmpublic_spark.queries.er_documents import dedup_cluster_summary

    return dedup_cluster_summary(spark, sf_dir, use_embeddings=True)


EXTRA = {
    "dd_minhash_production": _dd_minhash_production,
    "er_dedup_cosine": _er_dedup_cosine,
}


WARMUP_SF_DIR = "/root/testdata/sf0.001"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def release_job_state(spark) -> None:
    """Free per-query session state between timed queries: leftover
    checkpoint blocks (the CC loop's final generation stays pinned until
    its DataFrame is dropped — the bench drops it right here, the way a
    real application releases job state after writing results) and any
    cached relations. Runs OUTSIDE the timed window; without it, each
    query's pinned storage leaks into every later query's measurement."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for k in m.keySet().toArray():
        m.get(k).unpersist(False)
    spark.catalog.clearCache()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="mdm-bench")
    qs = registry.queries() | EXTRA

    if not os.environ.get("SPARK_GRAFT_NO_WARMUP") and os.path.isdir(WARMUP_SF_DIR):
        for name in HEADLINE:
            force(qs[name](spark, WARMUP_SF_DIR))
        release_job_state(spark)

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        release_job_state(spark)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
