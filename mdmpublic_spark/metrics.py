"""Per-stage / per-partition lineage counters → the `metrics` table.

Reference analog: ``insert_elk_entry`` appends ``[utc-ts] item property
value`` rows that feed the CBItemNum/ESItemNum Kibana trend dashboards
(/root/reference/bash/dump_db_summary/dump_db_summary.sh:60-99), and the
separate ES *audit* cluster records every mutation
(/root/reference/chef/setup_jenkins/jenkins_jobs/DeploySystem/config.xml:85-88).
Here every pipeline stage appends typed rows

    (ts TIMESTAMP, run_id STRING, stage STRING, partition_id INT,
     key STRING, value DOUBLE)

to a snapshot-versioned metrics table: partition_id = -1 for stage-level
counters (rows written, wall seconds, dropped pairs…), >= 0 for
per-partition row counts (the lineage required by the north_rule).

Scale note: per-partition counts are computed with a single
``groupBy(spark_partition_id())`` over the stage output — one narrow
aggregation, output rows = number of partitions (thousands at most),
safe to collect nowhere: it is written distributed, never collected.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mdmpublic_spark.tables import Table

METRICS_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("run_id", StringType()),
        StructField("stage", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("key", StringType()),
        StructField("value", DoubleType()),
    ]
)


class MetricsSink:
    """Collects counter rows per stage and appends them to the metrics table."""

    def __init__(self, table_path: str, run_id: str):
        self.table = Table(table_path)
        self.run_id = run_id
        self._pending: list[tuple] = []

    def add(self, stage: str, key: str, value: float, partition_id: int = -1) -> None:
        self._pending.append((time.time(), self.run_id, stage, partition_id, key, float(value)))

    def add_partition_counts(self, stage: str, df: DataFrame) -> int:
        """Record per-partition row counts of a stage output (lineage).

        Returns the total row count (so callers don't pay a second count).
        """
        rows = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # one row per partition — O(partitions), not O(data)
        )
        total = 0
        for r in rows:
            self.add(stage, "partition_rows", float(r["n"]), partition_id=int(r["pid"]))
            total += int(r["n"])
        self.add(stage, "rows", float(total))
        return total

    def flush(self, spark: SparkSession) -> None:
        if not self._pending:
            return
        data = [
            (None, run_id, stage, pid, key, val)  # ts filled below from epoch
            for (_, run_id, stage, pid, key, val) in self._pending
        ]
        epochs = [p[0] for p in self._pending]
        df = spark.createDataFrame(
            [(e, *rest[1:]) for e, rest in zip(epochs, data)],
            schema=StructType(
                [StructField("epoch", DoubleType())] + list(METRICS_SCHEMA.fields[1:])
            ),
        ).select(
            F.timestamp_seconds(F.col("epoch")).alias("ts"),
            "run_id",
            "stage",
            "partition_id",
            "key",
            "value",
        )
        self.table.append(df)
        self._pending = []

    def read(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)
