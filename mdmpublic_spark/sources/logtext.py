"""S3 — log-file text source: multi-file, rotation-aware, gz-transparent.

Reference behavior being reproduced: the flagship reports concatenate
rotated auth/history logs oldest-first, gunzipping the aged-out
generations, then regex-carve each line into typed fields
(/root/reference/jenkins_scripts/report/ssh_login_report.sh:51-88,137-203;
/root/reference/jenkins_scripts/report/os_package_action_report.sh:34-62).

Spark-first inversion: ``spark.read.text`` over the whole rotation glob —
Spark decompresses ``.gz`` members transparently and schedules one task
per file/split, so "concatenate oldest-first" becomes a parallel scan
whose line order is irrelevant because every carved row carries its own
keys and timestamp. The regex carve is one codegen'd projection
(``regexp_extract``), never a Python loop.

Also covers S8 (dynamic source list): the reference expands ``eval:``
entries of a file list into concrete paths at collection time
(/root/reference/jenkins_scripts/jenkins/collect_files.sh:85-118).
``expand_source_list`` is the driver-side analog — literal paths pass
through, ``glob:`` entries expand at plan time — feeding the computed
list into one ``spark.read`` call.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

# one syslog-ish line per event; epoch_us carries the exact timestamp so
# the text round-trip is lossless (the human-readable prefix is cosmetic,
# like the reference's `date -d` renderings)
_LINE_RE = (
    r"^(\S+) host-(\d+) app\[(\d+)\]: (\w+) epoch_us=(\d+) value=(\S+) props=(.*)$"
)


def format_event_lines(events: DataFrame):
    """events → one formatted log-line column (pure JVM expressions —
    deterministic across runs and parallelism)."""
    return events.select(
        F.concat(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit(" host-"),
            F.col("user_id").cast("string"),
            F.lit(" app["),
            F.col("event_id").cast("string"),
            F.lit("]: "),
            F.col("event_type"),
            F.lit(" epoch_us="),
            # parquet timestamps are NTZ; the session TZ is pinned UTC, so
            # the cast to (ltz) TIMESTAMP for unix_micros is lossless
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
            F.lit(" value="),
            F.col("value").cast("string"),
            F.lit(" props="),
            F.col("props"),
        ).alias("value"),
        "event_id",
    )


def write_rotated_logs(spark: SparkSession, events: DataFrame, out_dir: str) -> list[str]:
    """Materialize the rotation layout the reference reports consume:
    app.log (current) + app.log.1 + app.log.{2,3}.gz (aged, compressed).

    Generations are split on the event-time quartile (rotation is
    time-based), oldest generation most compressed — mirroring logrotate
    output. Idempotent via a _COMPLETE marker. This is fixture
    scaffolding for the reader below; in production the files exist.
    """
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return sorted(_glob.glob(os.path.join(out_dir, "app.log*")))
    q = events.agg(
        *[F.percentile_approx("ts", p, 10000).alias(f"q{i}") for i, p in
          ((1, 0.25), (2, 0.5), (3, 0.75))]
    ).first()
    lines = format_event_lines(events)
    ts = events.select("event_id", "ts")
    lines = lines.join(ts, "event_id").select("value", "ts")
    gens = [  # (filename, predicate, gzip)
        ("app.log.3.gz", F.col("ts") <= F.lit(q["q1"]), True),
        ("app.log.2.gz", (F.col("ts") > F.lit(q["q1"])) & (F.col("ts") <= F.lit(q["q2"])), True),
        ("app.log.1", (F.col("ts") > F.lit(q["q2"])) & (F.col("ts") <= F.lit(q["q3"])), False),
        ("app.log", F.col("ts") > F.lit(q["q3"]), False),
    ]
    tmp_root = out_dir + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp_root, exist_ok=True)
    for fname, pred, gz in gens:
        part_dir = os.path.join(tmp_root, f"part-{fname}")
        w = lines.where(pred).select("value").coalesce(1).write.mode("overwrite")
        if gz:
            w = w.option("compression", "gzip")
        w.text(part_dir)
        ext = ".txt.gz" if gz else ".txt"
        part = next(
            p for p in os.listdir(part_dir) if p.startswith("part-") and p.endswith(ext)
        )
        shutil.move(os.path.join(part_dir, part), os.path.join(tmp_root, fname))
        shutil.rmtree(part_dir)
    os.makedirs(out_dir, exist_ok=True)
    for fname, _, _ in gens:
        shutil.move(os.path.join(tmp_root, fname), os.path.join(out_dir, fname))
    shutil.rmtree(tmp_root, ignore_errors=True)
    with open(marker, "w") as f:
        f.write("ok\n")
    return sorted(_glob.glob(os.path.join(out_dir, "app.log*")))


def expand_source_list(entries: list[str]) -> list[str]:
    """S8 dynamic source-list expansion: ``glob:PATTERN`` entries expand
    to matching paths at plan time (oldest-rotation-first by name, like
    the reference's ``ls -rt`` ordering); plain entries pass through."""
    out: list[str] = []
    for e in entries:
        if e.startswith("glob:"):
            out.extend(sorted(_glob.glob(e[len("glob:"):]), reverse=True))
        else:
            out.append(e)
    return out


def read_event_log(spark: SparkSession, sources: list[str] | str) -> DataFrame:
    """Rotated-log scan → typed event rows.

    One ``spark.read.text`` over all generations (gz decompressed
    transparently, one task per file/split) and one codegen'd
    regexp_extract projection per field; malformed lines are dropped
    with the standard "carve failed ⇒ empty extract" filter the
    reference applies via grep pipelines.
    """
    if isinstance(sources, str):
        sources = [sources]
    lines = spark.read.text(list(sources))
    ex = lambda g: F.regexp_extract("value", _LINE_RE, g)  # noqa: E731
    parsed = lines.select(
        ex(3).alias("event_id_s"),
        ex(5).alias("epoch_us_s"),
        ex(2).alias("host_s"),
        ex(4).alias("event_type"),
        ex(6).alias("value_s"),
        ex(7).alias("props"),
    ).where(F.col("event_id_s") != "")
    return parsed.select(
        F.col("event_id_s").cast("long").alias("event_id"),
        F.timestamp_micros(F.col("epoch_us_s").cast("long"))
        .cast("timestamp_ntz")
        .alias("ts"),
        F.col("host_s").cast("long").alias("user_id"),
        "event_type",
        F.col("value_s").cast("double").alias("value"),
        "props",
    )
