"""Soak mode for the headline bench: repeat the full query set N times
in ONE session and fail on monotone per-query wall drift.

This is the automated version of the pinned-state leak the round-3
bench-isolation fix caught by hand (BENCH.md "per-query isolation"):
leaked session state — pinned checkpoint blocks, cached relations,
accumulated shuffle files — shows up as walls that RISE run over run on
identical code and input. A healthy long-lived application holds
per-query cost flat for hours; the reference drives the same assertion
through repeated JMeter plans with a golden pass/fail
(jenkins_scripts/jenkins/perform_load_test.sh:25-38).

Drift rule (per query): FAIL iff the walls are monotonically
non-decreasing across all reps AND the last rep is > (1+tol) × the
first. Shared-VM noise is ±30% but not monotone — requiring both
monotonicity and magnitude keeps the false-positive rate low while a
real leak (which compounds every rep) trips both.

``--leak`` deliberately skips the between-query state release, so the
known pinned-checkpoint leak reproduces and MUST fail the check — run it
once per round as the detector's self-test.

Usage:
  python tools/bench_soak.py [--reps 4] [--sf-dir /root/testdata/sf0.1]
                             [--tol 0.30] [--leak] [--report BENCH.md]
Exit code 0 = no drift; 1 = drift detected (or --leak failed to fail).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root bench.py: HEADLINE/EXTRA/force/release)
from mdmpublic_spark.queries import registry  # noqa: E402
from mdmpublic_spark.session import get_spark  # noqa: E402


def drifting(walls: list[float], tol: float) -> bool:
    """True iff walls rise monotonically AND end > (1+tol) × start."""
    if len(walls) < 2:
        return False
    monotone = all(b >= a for a, b in zip(walls, walls[1:]))
    return monotone and walls[-1] > (1.0 + tol) * walls[0]


def _pinned_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def run_soak(
    spark, sf_dir: str, reps: int, release_state: bool
) -> tuple[dict[str, list[float]], list[int]]:
    qs = registry.queries() | bench.EXTRA
    walls: dict[str, list[float]] = {n: [] for n in bench.HEADLINE}
    pinned: list[int] = []  # leaked-state witness: pinned RDDs after each rep
    for rep in range(reps):
        for name in bench.HEADLINE:
            t0 = time.time()
            bench.force(qs[name](spark, sf_dir))
            walls[name].append(round(time.time() - t0, 3))
            if release_state:
                bench.release_job_state(spark)
        pinned.append(_pinned_rdds(spark))
        print(f"# rep {rep}: total {sum(w[rep] for w in walls.values()):.1f}s, "
              f"pinned RDDs {pinned[-1]}", file=sys.stderr)
    return walls, pinned


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tol", type=float, default=0.30)
    ap.add_argument("--leak", action="store_true",
                    help="skip the between-query state release (the known "
                         "leak) — the check must FAIL in this mode")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="mdm-bench-soak")
    # one warmup pass outside the soak window (JIT/codegen, as bench.py)
    if os.path.isdir(bench.WARMUP_SF_DIR):
        qs = registry.queries() | bench.EXTRA
        for name in bench.HEADLINE:
            bench.force(qs[name](spark, bench.WARMUP_SF_DIR))
        bench.release_job_state(spark)

    walls, pinned = run_soak(spark, args.sf_dir, args.reps, release_state=not args.leak)
    spark.stop()

    drifts = {n: w for n, w in walls.items() if drifting(w, args.tol)}
    totals = [round(sum(w[i] for w in walls.values()), 3) for i in range(args.reps)]
    out = {
        "metric": "soak_drift",
        "reps": args.reps,
        "sf_dir": args.sf_dir,
        "leak_mode": args.leak,
        "totals_per_rep": totals,
        "total_drifting": drifting(totals, args.tol),
        "drifting_queries": sorted(drifts),
        "pinned_rdds_per_rep": pinned,
        "walls": walls,
    }
    print(json.dumps(out))

    any_drift = bool(drifts) or out["total_drifting"]
    if args.report:
        verdict = ("LEAK DETECTED (expected)" if args.leak and any_drift else
                   "FAIL" if any_drift else "clean")
        with open(args.report, "a") as f:
            f.write(
                f"\n| {'leak (no state release)' if args.leak else 'normal'} "
                f"| {args.reps} | {', '.join(f'{t:.1f}' for t in totals)} "
                f"| {', '.join(sorted(drifts)) or '—'} | {verdict} |\n"
            )

    if args.leak:
        # Self-test: the deliberate leak must be VISIBLE — either as wall
        # drift, or (when the sandbox's storage headroom absorbs the
        # pinned blocks without slowing anything yet) as monotonically
        # accumulating pinned state, the precursor the drift rule exists
        # to catch. The drift rule itself is unit-tested on synthetic
        # walls (tests/test_ops_sources.py::test_soak_drift_detector).
        # max-vs-first, not last-vs-first: the monotone climb across reps
        # is the evidence; the FINAL value races ContextCleaner GC (a
        # reclaim on the last rep must not flip the self-test).
        accumulating = len(pinned) >= 2 and max(pinned) > pinned[0]
        sys.exit(0 if (any_drift or accumulating) else 1)
    sys.exit(1 if any_drift else 0)


if __name__ == "__main__":
    main()
