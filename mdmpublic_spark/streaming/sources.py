"""Structured Streaming sources (SURVEY.md §2.9).

The reference's continuous sources are append-only logs polled per run:
an inotify file-change stream (`jenkins_scripts/monitor/
monitor_server_filechanges.sh:52-56`) and collected app/slow logs
(`chef/setup_jenkins/jenkins_jobs/CollectFiles/config.xml:25-34`),
consumed by Jenkins jobs in poll-based micro-batches (`bash/wait_for/
wait_for.sh:30-45`).  The Spark-native re-expression is the file
source: new files landing in a directory ARE the stream; the
checkpointed offset log replaces the reference's truncate-and-rebaseline
acknowledgement (`monitor_server_filechanges.sh:243-247`).

Scale note: the file source lists the input directory per micro-batch;
at 100 TB-feed scale, set `maxFilesPerTrigger` so each micro-batch is
bounded, and keep landing dirs partitioned by arrival hour so listing
stays O(new files), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def pages_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """New parquet files of pages landing in a directory, as a stream
    (the staging-bucket ingest feed, SURVEY.md §3.4)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


# Event timestamps are microsecond-resolution. JSON timestamp *format
# options* are a trap here (TimestampType and TimestampNTZType read
# different option keys, and the default pattern truncates to millis),
# so the landing format carries `ts` as Spark's canonical timestamp
# string (`cast(ts as string)` — lossless, variable-length micros) and
# the reader casts it back. String→timestamp cast is format-option-free
# and exact in a UTC session.
EVENT_TS_FORMAT = "cast-string-v2"  # landing-format version tag

_EVENTS_WIRE_SCHEMA = T.StructType(
    [f if f.name != "ts" else T.StructField("ts", T.StringType()) for f in EVENTS_SCHEMA]
)


def events_to_landing(events: DataFrame) -> DataFrame:
    """Project an events DataFrame into the json-lines landing shape."""
    return events.withColumn("ts", F.col("ts").cast("string"))


def events_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Append-only event-log stream (json lines — the reference's log
    streams are line-oriented text; Spark reads .gz transparently)."""
    reader = spark.readStream.schema(_EVENTS_WIRE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.json(landing_dir)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
