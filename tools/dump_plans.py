"""Dump formatted physical plans for representative queries → PLANS.md.

The plan-shape regression tests (tests/test_plan_shapes.py) assert the
properties machine-checkably; this artifact makes the same evidence
human-readable: which scans prune/push down, which joins broadcast,
where whole-stage codegen spans, and where the deliberate Python
crossings (Arrow UDFs) sit.

Plans are captured at plan time (no job runs): `.explain` output of the
lazy DataFrame each registry entry builds over the sf0.001 tables.

Usage: python tools/dump_plans.py [--sf-dir /root/testdata/sf0.001] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# entry -> one-line note on what the plan should show (and why it scales)
SHOWCASE: dict[str, str] = {
    "q1_pricing_summary": (
        "5-column pruned parquet scan (ReadSchema) -> partial hash "
        "aggregate (map-side combine) -> final aggregate; one shuffle."
    ),
    "p6_time_window": (
        "timestamp-literal comparison reaches the scan as PushedFilters "
        "(no per-row casting defeats pushdown)."
    ),
    "j1_broadcast_lookup": (
        "small dimension side broadcast (BroadcastHashJoin) — no shuffle "
        "of the fact side."
    ),
    "j7_theta_like": (
        "deliberate BroadcastNestedLoopJoin: theta/contains join with a "
        "bounded broadcast side — the one shape where BNLJ is correct."
    ),
    "w2_topk": (
        "ORDER BY + LIMIT planned as TakeOrderedAndProject — no global "
        "sort materialization."
    ),
    "w5_tail_n": (
        "tail-N re-expressed as ORDER BY DESC + LIMIT -> "
        "TakeOrderedAndProject (round-4 fix): no unpartitioned "
        "row_number() window, so no single-task sort of the full table."
    ),
    "dd_token_jaccard_pairs": (
        "prefix-filtered inverted-list self-join (PPJoin family): "
        "postings ranked per doc by global df order (one Window pass), "
        "pair join restricted to each doc's rarest m-ceil(t*n)+1 tokens "
        "with size + positional filters, then exact verify on candidates "
        "only; df-capped via a broadcast filter join."
    ),
    "dd_minhash_token_pairs": (
        "order-insensitive TOKEN-set MinHash arm (round 5): JVM-side "
        "xxhash64 of distinct tokens feeds the int64-array signature UDF "
        "(one Arrow crossing, no per-token strings), banding stays in "
        "whole-stage codegen, candidates come from a band-key equi-join "
        "(SortMergeJoin/ShuffledHashJoin on the band string — never a "
        "cartesian), exact token verify restricted to candidates."
    ),
    "dd_fingerprint_pairs": (
        "O(1)-per-doc sketch join: 4 int64 rows per doc through the "
        "shuffle; the Python crossing is only the fingerprint UDF on the "
        "scan side."
    ),
    "ann_ivf_topk": (
        "IVF probe: centroid assignment via bounded broadcast, cell-"
        "pruned candidate join, per-query top-k window."
    ),
    "er_link_sources": (
        "cross-source (R-S) prefix-filtered linkage join: A-prefixes x "
        "B-prefixes only (no same-side pairs), joinable tokens require "
        "both-side presence, verify restricted to candidates; all joins "
        "key on int64-hashed tokens."
    ),
    "er_golden_records": (
        "stage-6 survivorship: uniform left join (docs x assignment) + "
        "one window over cluster_id — pair-capping bounds cluster sizes "
        "so the window partition never skews."
    ),
    "dd_span_dedup": (
        "span-level corpus dedup: posexplode (map-side span build, no "
        "shuffle) -> span-count groupBy keyed on xxhash64 int64 with "
        "partial aggregation -> one keyed join back -> per-doc "
        "reassembly groupBy; the only corpus-wide state is the int64 "
        "count table."
    ),
    "ta_repetition_stats": (
        "Gopher repetition signals: explode -> groupBy(doc,gram) -> "
        "groupBy(doc), both with map-side combine — linear in corpus "
        "tokens, no per-row quadratic higher-order loops."
    ),
    "ta_quota_sample": (
        "deterministic training-mix sample: pure map-side filter on an "
        "md5-derived bucket; zero shuffles, zero Python crossings."
    ),
    "er_block_pairs": None,  # composed below, not a registry entry
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="PLANS.md")
    args = ap.parse_args()

    from mdmpublic_spark.queries import registry
    from mdmpublic_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    # components(): per-operator plans (the driver registry serves merged
    # family unions; a union's plan is just its components' side by side)
    qs = registry.components()

    sections = []
    for name, note in SHOWCASE.items():
        if name not in qs:
            continue
        df = qs[name](spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        sections.append((name, note, buf.getvalue().rstrip()))

    with open(args.out, "w") as f:
        f.write(
            "# PLANS — formatted physical plans of representative queries\n\n"
            "Generated by `python tools/dump_plans.py` at plan time (no\n"
            "execution) over the sf0.001 tables. The machine-checked\n"
            "versions of these properties live in\n"
            "`tests/test_plan_shapes.py`; AQE may further coalesce\n"
            "partitions and convert joins at runtime (improving, never\n"
            "degrading, the shapes shown).\n"
        )
        for name, note, plan in sections:
            f.write(f"\n## {name}\n\n{note}\n\n```\n{plan}\n```\n")
    print(f"wrote {args.out} ({len(sections)} plans)")


if __name__ == "__main__":
    main()
