"""Structured Streaming tests (SURVEY.md §2.9): the streaming results
must equal the batch computation over the same data — the reference's
poll-based monitors likewise see exactly the rows that accumulated.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mdmpublic_spark.streaming.ingest import start_staged_ingest
from mdmpublic_spark.streaming.monitors import (
    alarm_stream,
    dedup_stream,
    run_available_now,
    run_available_now_complete,
    session_windows,
    windowed_event_counts,
)
from mdmpublic_spark.streaming.sources import EVENTS_SCHEMA, events_stream, pages_stream

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """Events from the driver testdata, landed as json-line files in two
    chunks (two 'polls' worth of log lines)."""
    d = tmp_path_factory.mktemp("landing")
    ev = (
        spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
        .withColumn("ts_s", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .limit(4000)
    )
    rows = ev.collect()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(d / f"chunk{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                            "ts": r["ts_s"],
                            "value": r["value"],
                            "props": r["props"],
                        }
                    )
                    + "\n"
                )
    return str(d), len(rows)


def test_windowed_counts_match_batch(spark, landing, tmp_path):
    d, _n = landing
    stream = events_stream(spark, d)
    agg = windowed_event_counts(stream, window="1 day", watermark="1 hour")
    got = run_available_now_complete(agg, str(tmp_path / "ck"), "win_counts")

    batch = spark.read.schema(EVENTS_SCHEMA).json(d)
    want = (
        batch.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp("win.start").alias("win_start_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )
    g = {(r["win_start_epoch"], r["event_type"]): r["n"] for r in got.collect()}
    w = {(r["win_start_epoch"], r["event_type"]): r["n"] for r in want.collect()}
    assert g == w and len(g) > 0


def test_alarm_and_dedup_stream(spark, landing, tmp_path):
    d, n = landing
    stream = events_stream(spark, d)
    out = str(tmp_path / "alarms")
    run_available_now(alarm_stream(dedup_stream(stream), threshold=40.0),
                      str(tmp_path / "ck"), out)
    got = spark.read.parquet(out)
    batch = spark.read.schema(EVENTS_SCHEMA).json(d)
    want = batch.dropDuplicates(["event_id", "ts"]).where(F.col("value") > 40.0)
    assert got.count() == want.count()
    assert got.count() > 0


def test_session_windows_runs(spark, landing, tmp_path):
    d, _ = landing
    sess = session_windows(events_stream(spark, d), gap="30 minutes")
    got = run_available_now_complete(sess, str(tmp_path / "ck"), "sessions")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["duration_seconds"] >= 0 and r["n_events"] >= 1 for r in rows)


def test_alarm_hysteresis_stateful(spark, tmp_path):
    """applyInPandasWithState per-key raise/clear state machine: state
    must carry ACROSS micro-batches (maxFilesPerTrigger=1 forces one
    batch per landing file) and the emitted transitions must equal a
    single-pass driver-side walk of the globally ordered stream."""
    from mdmpublic_spark.streaming.stateful import (
        alarm_hysteresis,
        hysteresis_reference,
    )

    ev = (
        spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
        .select("user_id", "event_id", "ts", "value")
        .orderBy("ts", "event_id")
        .limit(3000)
        .collect()
    )
    vals = sorted(r["value"] for r in ev)
    threshold = vals[int(len(vals) * 0.4)]  # breaches common → many flips

    # land the timeline in two ordered chunks → two micro-batches
    d = tmp_path / "hyst_landing"
    d.mkdir()
    half = len(ev) // 2
    for i, chunk in enumerate((ev[:half], ev[half:])):
        with open(d / f"chunk{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "user_id": r["user_id"],
                            "event_type": "t",
                            "ts": str(r["ts"]),
                            "value": r["value"],
                            "props": "{}",
                        }
                    )
                    + "\n"
                )

    stream = events_stream(spark, str(d), max_files_per_trigger=1)
    out = str(tmp_path / "transitions")
    run_available_now(
        alarm_hysteresis(stream, threshold=threshold, raise_after=2, clear_after=2),
        str(tmp_path / "ck"),
        out,
    )
    got = sorted(
        (r["user_id"], r["ts"], r["transition"], r["value"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        hysteresis_reference(
            ((r["user_id"], r["event_id"], r["ts"], r["value"]) for r in ev),
            threshold,
            raise_after=2,
            clear_after=2,
        )
    )
    assert len(want) > 10  # the fixture must actually exercise flips
    assert got == want
    # alternation invariant: per key, raise and clear strictly alternate
    per_key: dict = {}
    for uid, ts, tr, _v in got:
        per_key.setdefault(uid, []).append(tr)
    for seq in per_key.values():
        assert seq[0] == "raise"
        assert all(a != b for a, b in zip(seq, seq[1:]))


def test_staged_ingest_incremental(spark, corpus_dir, tmp_path):
    """Two micro-batch drains over a growing landing dir: the staging
    table ends up with every page extracted exactly once (checkpoint
    offsets skip already-ingested files on the second drain)."""
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet")).limit(400)
    pages = pages.cache()
    n_total = pages.count()
    land = tmp_path / "pages_landing"
    staging = str(tmp_path / "staging")
    blocked = str(tmp_path / "blocked")
    ck = str(tmp_path / "ck")

    first = pages.orderBy("url").limit(250).cache()
    first.write.mode("overwrite").parquet(str(land))
    start_staged_ingest(pages_stream(spark, str(land)), staging, blocked, ck)
    n1 = spark.read.parquet(staging).count()
    assert n1 == first.count()

    # second poll: only the delta file lands; offsets skip the old ones
    second = pages.join(first.select("url"), "url", "left_anti")
    second.write.mode("append").parquet(str(land))
    start_staged_ingest(pages_stream(spark, str(land)), staging, blocked, ck)
    staged = spark.read.parquet(staging)
    assert staged.count() == n_total
    assert staged.select("url").distinct().count() == n_total
    # blocked index covers every staged page at least via its domain key
    bk = spark.read.parquet(blocked)
    assert bk.select("url").distinct().count() == n_total


def test_landing_roundtrip_lossless(spark, tmp_path):
    """events_to_landing → json → events_stream must preserve event
    timestamps exactly (microsecond resolution) — the format-option trap
    this guards against: JSON timestampFormat/timestampNTZFormat apply to
    different column types and default patterns truncate to millis."""
    from mdmpublic_spark.streaming.sources import events_to_landing

    ev = (
        spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
        .limit(500)
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    d = str(tmp_path / "landing")
    events_to_landing(
        ev.select(
            "event_id",
            F.lit(1).cast("long").alias("user_id"),
            F.lit("t").alias("event_type"),
            "ts",
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    ).write.json(d)

    out_dir = str(tmp_path / "out")
    run_available_now(events_stream(spark, d), str(tmp_path / "ck"), out_dir)
    got = spark.read.parquet(out_dir).select("event_id", "ts")

    orig = {r["event_id"]: r["ts"] for r in ev.collect()}
    back = {r["event_id"]: r["ts"] for r in got.collect()}
    assert back == orig  # exact, including microseconds
