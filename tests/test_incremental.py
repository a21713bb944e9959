"""Incremental ER batch tests — the equivalence contract, resume
idempotence, and cap-crossing accounting (mdmpublic_spark/incremental.py).

The binding check: folding a delta batch into a completed run produces
EXACTLY the tables a full recompute over (base ∪ delta) produces, given
the same frozen profile and no admission-cap crossings — same scored
pairs bit-for-bit, same clusters, same golden flags.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from mdmpublic_spark.gen.synth import generate_corpus
from mdmpublic_spark.incremental import incremental_update
from mdmpublic_spark.operators.pairs import PairGenStats, delta_candidate_pairs
from mdmpublic_spark.pipeline import PipelineConfig, run_pipeline
from mdmpublic_spark.tables import Table

N_RECAPTURES = 5


@pytest.fixture(scope="module")
def inc(spark, tmp_path_factory):
    """Base run + incremental batch + frozen-profile full recompute.

    The delta is a deterministic 1-in-4 url-hash slice (so duplicate
    groups span the split) plus N_RECAPTURES newer captures of existing
    base urls whose html is swapped with another page's — exercising the
    changed-url retraction path, not just inserts."""
    root = tmp_path_factory.mktemp("inc")
    corpus = str(root / "corpus")
    generate_corpus(corpus, n_pages=1000)
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))

    in_delta = F.pmod(F.xxhash64("url"), F.lit(4)) == 0
    base = pages.where(~in_delta)
    delta_new = pages.where(in_delta)

    donors = base.orderBy("url").limit(2 * N_RECAPTURES).collect()
    recap_rows = [
        (
            donors[i]["url"],
            donors[i]["warc_ts"] + datetime.timedelta(days=1),
            donors[i + N_RECAPTURES]["html"],
            donors[i + N_RECAPTURES]["text"],
            donors[i]["lang"],
        )
        for i in range(N_RECAPTURES)
    ]
    recap = spark.createDataFrame(recap_rows, pages.schema)
    delta = delta_new.unionByName(recap)

    base_path = str(root / "base.parquet")
    delta_path = str(root / "delta.parquet")
    union_path = str(root / "union.parquet")
    base.write.parquet(base_path)
    delta.write.parquet(delta_path)
    base.unionByName(delta).write.parquet(union_path)

    # the generator's Zipf head domain crosses the default d:100
    # admission cap between base and union — a real grandfathering case,
    # but this fixture pins exact equivalence, so the domain cap is
    # raised above the head (crossing behavior is unit-tested below)
    caps = {"d:": 400}
    wd_inc = str(root / "wd_inc")
    run_pipeline(spark, base_path, wd_inc, PipelineConfig(prefix_caps=caps))
    summary = incremental_update(
        spark, delta_path, wd_inc, PipelineConfig(prefix_caps=caps)
    )

    wd_full = str(root / "wd_full")
    run_pipeline(
        spark,
        union_path,
        wd_full,
        PipelineConfig(
            prefix_caps=caps, frozen_profile=os.path.join(wd_inc, "profile")
        ),
    )
    return {
        "summary": summary,
        "wd_inc": wd_inc,
        "wd_full": wd_full,
        "delta_path": delta_path,
        "n_delta_new": delta_new.count(),
    }


def test_batch_counters(inc):
    s = inc["summary"]
    assert s["new_urls"] == inc["n_delta_new"]
    assert s["changed_urls"] == N_RECAPTURES
    assert s["delta_pairs"] > 0
    # precondition for the exact-equivalence checks below: nothing was
    # grandfathered in this fixture
    assert s["pair_stats"]["grandfathered_blocks"] == 0


def test_incremental_scored_equals_full(spark, inc):
    """The merged scored table equals the full recompute's, bit-for-bit
    (scores are deterministic doubles from identical code paths)."""
    cols = ["url_a", "url_b", "score"]
    a = {tuple(r) for r in Table(os.path.join(inc["wd_inc"], "score")).read(spark).select(*cols).collect()}
    b = {tuple(r) for r in Table(os.path.join(inc["wd_full"], "score")).read(spark).select(*cols).collect()}
    assert a == b


def test_incremental_clusters_equal_full(spark, inc):
    cols = ["url", "cluster_id", "is_golden"]
    a = sorted(
        tuple(r)
        for r in Table(os.path.join(inc["wd_inc"], "golden")).read(spark).select(*cols).collect()
    )
    b = sorted(
        tuple(r)
        for r in Table(os.path.join(inc["wd_full"], "golden")).read(spark).select(*cols).collect()
    )
    assert a == b


def test_recaptured_urls_moved_cluster(spark, inc):
    """A recaptured url whose text became another page's text must end up
    co-clustered with that page (or at least leave its old cluster) —
    proves retraction + rescore actually happened."""
    golden = Table(os.path.join(inc["wd_inc"], "golden")).read(spark)
    extract = Table(os.path.join(inc["wd_inc"], "extract")).read(spark)
    # recaptured urls now carry their donor's text: same text ⇒ exact
    # duplicates ⇒ must share a cluster with the donor
    dup = (
        extract.alias("x")
        .join(extract.alias("y"), F.col("x.text") == F.col("y.text"))
        .where(F.col("x.url") < F.col("y.url"))
        .select(F.col("x.url").alias("u"), F.col("y.url").alias("v"))
    )
    g = golden.select("url", "cluster_id")
    mismatched = (
        dup.join(g.withColumnRenamed("url", "u").withColumnRenamed("cluster_id", "cu"), "u")
        .join(g.withColumnRenamed("url", "v").withColumnRenamed("cluster_id", "cv"), "v")
        .where(F.col("cu") != F.col("cv"))
        .count()
    )
    assert mismatched == 0


def test_incremental_rerun_is_noop(spark, inc):
    """Re-running a completed batch skips every stage and re-applies no
    merge: identical snapshots, ran == []."""
    s2 = incremental_update(
        spark, inc["delta_path"], inc["wd_inc"], PipelineConfig(prefix_caps={"d:": 400})
    )
    assert s2["ran"] == []
    assert s2["snapshots"] == inc["summary"]["snapshots"]


def test_delta_pairs_cap_crossing_detected(spark):
    """A block pushed past the cap by the batch yields NO new pairs and
    is counted as grandfathered (derived from combined sizes minus delta
    memberships — no prior-table scan); a block still under the cap
    yields only delta-touching pairs (old-old pairs never regenerate)."""
    prior = spark.createDataFrame(
        [(f"u{i}", "k") for i in range(5)] + [("u8", "m"), ("u9", "m")],
        "url string, block_key string",
    )
    delta_rows = [("u6", "k"), ("u7", "k"), ("u10", "m")]
    all_blocked = prior.unionByName(
        spark.createDataFrame(delta_rows, "url string, block_key string")
    )
    delta_urls = spark.createDataFrame([("u6",), ("u7",), ("u10",)], "url string")
    stats = PairGenStats()
    pairs = {
        (r["url_a"], r["url_b"])
        for r in delta_candidate_pairs(
            all_blocked,
            delta_urls,
            max_block_size=6,
            broadcast_threshold=100,
            stats=stats,
            prefix_caps=None,
        ).collect()
    }
    # block k: 5 prior + 2 delta = 7 > cap 6 → no pairs, grandfathered
    assert stats.oversize_blocks == 1
    assert stats.grandfathered_blocks == 1
    assert stats.grandfathered_pairs_est == 10  # C(5,2) previously scored
    # block m: u8,u9 prior + u10 delta → only pairs touching u10
    assert pairs == {("u10", "u8"), ("u10", "u9")}


def test_insert_only_batch_equals_full(spark, tmp_path_factory):
    """The append fast path (no changed urls → no dissolution, fast
    appends everywhere) must also match a frozen-profile full recompute
    exactly."""
    root = tmp_path_factory.mktemp("inc-insert")
    corpus = str(root / "corpus")
    generate_corpus(corpus, n_pages=400, seed=5)
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    in_delta = F.pmod(F.xxhash64("url"), F.lit(5)) == 0
    base_path, delta_path, union_path = (
        str(root / "base.parquet"),
        str(root / "delta.parquet"),
        str(root / "union.parquet"),
    )
    pages.where(~in_delta).write.parquet(base_path)
    pages.where(in_delta).write.parquet(delta_path)
    pages.write.parquet(union_path)

    caps = {"d:": 400}
    wd = str(root / "wd")
    run_pipeline(spark, base_path, wd, PipelineConfig(prefix_caps=caps))
    s1 = incremental_update(spark, delta_path, wd, PipelineConfig(prefix_caps=caps))
    assert s1["changed_urls"] == 0
    assert s1["pair_stats"]["grandfathered_blocks"] == 0

    wd_full = str(root / "wd_full")
    run_pipeline(
        spark,
        union_path,
        wd_full,
        PipelineConfig(prefix_caps=caps, frozen_profile=os.path.join(wd, "profile")),
    )
    cols = ["url", "cluster_id", "is_golden"]
    a = sorted(tuple(r) for r in Table(os.path.join(wd, "golden")).read(spark).select(*cols).collect())
    b = sorted(tuple(r) for r in Table(os.path.join(wd_full, "golden")).read(spark).select(*cols).collect())
    assert a == b
    sc = ["url_a", "url_b", "score"]
    x = {tuple(r) for r in Table(os.path.join(wd, "score")).read(spark).select(*sc).collect()}
    y = {tuple(r) for r in Table(os.path.join(wd_full, "score")).read(spark).select(*sc).collect()}
    assert x == y
