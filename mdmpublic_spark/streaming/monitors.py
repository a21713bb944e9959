"""Streaming monitors and windowed trend aggregations (SURVEY.md §2.9).

Re-expresses the reference's poll-based monitoring jobs as Structured
Streaming queries:

  * windowed_event_counts — the daily CBItemNum/ESItemNum trend counters
    (`bash/dump_db_summary/dump_db_summary.sh:60-62,85-87`) as a
    watermarked tumbling-window aggregate (late rows within the
    watermark still land in their window; older ones are dropped
    exactly once, unlike the reference's at-poll-time snapshot).
  * alarm_stream — "non-empty log ⇒ alarm" (`jenkins_scripts/monitor/
    monitor_server_filechanges.sh:96-112`): a filter; any row that
    survives IS the alarm. Sticky-failure semantics
    (`monitor_git_filechanges.sh:117-120`) come free from the sink:
    alarms are appended durably and stay until acknowledged.
  * session_windows — ssh-session duration accounting
    (`jenkins_scripts/report/ssh_login_report.sh:38-49`) via Spark's
    built-in session_window (gap-based), replacing per-key
    first-open/last-close pairing.
  * dedup_stream — exactly-once duplicate suppression on the natural
    key within the watermark horizon (the reference relies on
    idempotent overwrite; streaming uses dropDuplicates state).

All are stateful streaming aggregations: state lives in the checkpoint
dir, partitioned by key — scale = state-store shards, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame, window: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Per-window per-type trend counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.unix_timestamp("win.start").alias("win_start_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )


def alarm_stream(events: DataFrame, threshold: float = 600.0) -> DataFrame:
    """Latency-SLO alarm rows (network_latency_report.sh:111-118: value
    over threshold ⇒ error row; TIMEOUT_THRESHOLD_MS=600)."""
    return events.where(F.col("value") > F.lit(threshold)).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessionization per user: session start/end/duration and
    event count — the W4 sessionized-duration operator, streaming-native."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("sw.start").alias("session_start_epoch"),
            F.unix_timestamp("sw.end").alias("session_end_epoch"),
            (F.unix_timestamp("sw.end") - F.unix_timestamp("sw.start")).alias(
                "duration_seconds"
            ),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once duplicate suppression on event_id within the
    watermark horizon (state-store backed, sharded by key)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, out_dir: str) -> None:
    """Drain everything currently available into parquet and stop — the
    poll-based micro-batch consumption model of every reference monitor
    job (each Jenkins run processes what accumulated since last run);
    the checkpoint dir carries offsets + state across invocations."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_complete(
    stream_df: DataFrame, checkpoint_dir: str, table_name: str
) -> DataFrame:
    """Drain with complete-mode output into an in-memory table (for
    aggregates; returns the final snapshot DataFrame)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(table_name)
