"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: run the MDM record-linkage
    pipeline over the `documents` table (doc_id/text/source mapped onto the
    url/text/domain page model) and return the duplicate-cluster summary —
    the top-K shape of /root/reference/jenkins_scripts/performance/
    diagnostic_jenkinsjob_slow/diagnostic_jenkinsjob_slow.py:88-92."""
    from mdmpublic_spark.queries.er_documents import dedup_cluster_summary

    return dedup_cluster_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased identically in the
    matching ``oracle_sql`` entry.
    """
    from mdmpublic_spark.queries import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same parquet views)."""
    from mdmpublic_spark.queries import registry

    return registry.oracle_sql()
