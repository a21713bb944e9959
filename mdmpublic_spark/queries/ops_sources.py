"""Operational source/sink queries: S3 log-text scan, S8 dynamic source
lists, P7 retention delete, S10 merge upsert, S12 backup/restore — each
driver-checkable against a DuckDB oracle over the same base tables.

The log entries materialize a deterministic rotated/gzipped log layout
*derived from the events table* (once per scale factor, marker-guarded),
then exercise the real text-scan path; the oracle recomputes the result
from the source table, closing the loop text→parse→agg ≡ table→agg.
The table-mutating entries (P7/S10/S12) run the genuine Table operators
against a throwaway copy under /tmp, so the committed semantics — not a
simulation — produce the compared rows.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from mdmpublic_spark.backup import BackupManager
from mdmpublic_spark.sources.logtext import (
    expand_source_list,
    read_event_log,
    write_rotated_logs,
)
from mdmpublic_spark.tables import Table


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _log_dir(sf_dir: str) -> str:
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"mdm_eventlogs_{tag}")


def _ensure_logs(spark, sf_dir) -> list[str]:
    d = _log_dir(sf_dir)
    write_rotated_logs(spark, _events(spark, sf_dir), d)
    # S8: the source list is computed at plan time from a glob entry,
    # then fed as an explicit path list into one spark.read call
    return expand_source_list([f"glob:{d}/app.log*"])


# ------------------------------------------------------------ S3 + S8 ---


def s3_log_parse(spark, sf_dir):
    """Rotated gz logs → typed rows; must round-trip the events table."""
    return read_event_log(spark, _ensure_logs(spark, sf_dir))


def s8_dynamic_sources(spark, sf_dir):
    """S8 proper — dynamic source-list expansion as its own operator:
    a manifest mixing ``glob:`` entries (the aged gz generations, whose
    names only exist at plan time) with literal paths (the live log and
    its first rotation) is expanded driver-side by
    ``expand_source_list`` and fed to ONE ``spark.read.text`` call —
    the Spark-first analog of the reference's ``eval:`` file-list
    entries (jenkins_scripts/jenkins/collect_files.sh:85-118). The
    per-type counts must equal the events table's, proving the
    expansion covered every generation exactly once."""
    d = _log_dir(sf_dir)
    write_rotated_logs(spark, _events(spark, sf_dir), d)
    manifest = [
        f"glob:{d}/app.log.*.gz",   # computed at plan time
        f"{d}/app.log.1",           # literal entries pass through
        f"{d}/app.log",
    ]
    paths = expand_source_list(manifest)
    ev = read_event_log(spark, paths)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def s3_log_sessions(spark, sf_dir):
    """The ssh_login_report shape: per-user session summary carved out of
    the raw log text (first/last activity, event count, error count)."""
    ev = read_event_log(spark, _ensure_logs(spark, sf_dir))
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
        # exact decimal sum surfaced as double (the repo's cross-engine
        # float discipline, queries/relational.py:_dsum)
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


# ----------------------------------------------------------------- P7 ---

_CUTOFF = "2024-01-08 00:00:00"


def p7_retention_delete(spark, sf_dir):
    """Retention policy run through the real row-level delete: copy the
    events table, DELETE ts < cutoff, return the surviving rows."""
    with tempfile.TemporaryDirectory(prefix="mdm-p7-") as d:
        t = Table(os.path.join(d, "events"))
        t.overwrite(_events(spark, sf_dir))
        t.delete_where(spark, f"ts < TIMESTAMP '{_CUTOFF}'")
        # materialize before the tempdir vanishes (localCheckpoint returns
        # the checkpointed frame; the original still reads the files)
        return t.read(spark).localCheckpoint(eager=True)


# ---------------------------------------------------------------- S10 ---


def s10_merge_upsert(spark, sf_dir):
    """MERGE-INTO semantics through Table.merge_upsert: a staging batch
    (every order with key%10 < 3, repriced 2x) upserts into the master
    orders table; result = merged state."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    updates = orders.where(F.col("o_orderkey") % 10 < 3).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    with tempfile.TemporaryDirectory(prefix="mdm-s10-") as d:
        t = Table(os.path.join(d, "orders"))
        t.overwrite(orders)
        t.merge_upsert(spark, updates, ["o_orderkey"])
        return t.read(spark).localCheckpoint(eager=True)


# ---------------------------------------------------------------- S12 ---


def s12_backup_restore(spark, sf_dir):
    """full → diff → accu backup chain over three appends, then restore
    the newest generation; result must equal the full events table."""
    ev = _events(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="mdm-s12-") as d:
        t = Table(os.path.join(d, "events"))
        mgr = BackupManager(os.path.join(d, "bk"))
        t.overwrite(ev.where(F.col("event_id") % 3 == 0))
        mgr.backup(t, "full")
        t.append(ev.where(F.col("event_id") % 3 == 1))
        mgr.backup(t, "diff")
        t.append(ev.where(F.col("event_id") % 3 == 2))
        mgr.backup(t, "accu")
        restored = mgr.restore(os.path.join(d, "restored"))
        return restored.read(spark).localCheckpoint(eager=True)


# ------------------------------------------------------------- oracles ---

ORACLES: dict[str, str] = {
    "s3_log_parse": """
        SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
    "s8_dynamic_sources": """
        SELECT event_type,
               count(*) AS n_events,
               sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
        FROM events GROUP BY event_type
    """,
    "s3_log_sessions": """
        SELECT user_id,
               count(*) AS n_events,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors,
               sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
        FROM events GROUP BY user_id
    """,
    "p7_retention_delete": f"""
        SELECT * FROM events WHERE NOT (ts < TIMESTAMP '{_CUTOFF}')
    """,
    "s10_merge_upsert": """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 10 < 3 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
    """,
    "s12_backup_restore": "SELECT * FROM events",
}

_FNS = {
    "s3_log_parse": s3_log_parse,
    "s8_dynamic_sources": s8_dynamic_sources,
    "s3_log_sessions": s3_log_sessions,
    "p7_retention_delete": p7_retention_delete,
    "s10_merge_upsert": s10_merge_upsert,
    "s12_backup_restore": s12_backup_restore,
}

