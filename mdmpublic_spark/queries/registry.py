"""The operator-inventory registry behind __spark_entry__.queries().

Each entry is one operator from SURVEY.md §2, expressed Spark-first over
the driver's parquet tables; `ORACLES` holds the DuckDB-equivalent SQL
(column names aliased identically on both sides — the driver compares
value hashes after sorting columns by name). Entries without an oracle
(non-SQL-expressible: MinHash-LSH, iterative CC) get the driver's
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mdmpublic_spark.queries import coverage, ops_sources, relational, training_data
from mdmpublic_spark.queries.er_documents import (
    CC_JACCARD_ORACLE,
    cc_jaccard_clusters,
    dedup_cluster_summary,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _ensure()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure()
    return dict(ORACLES)


_loaded = False


def _ensure() -> None:
    global _loaded
    if _loaded:
        return
    relational.register_all(register)
    training_data.register_all(register)
    ops_sources.register_all(register)
    coverage.register_all(register)
    # ER flagship — MinHash-LSH + iterative CC: not SQL-expressible,
    # driver records the rows-only check
    register("er_dedup_cluster_summary", dedup_cluster_summary)
    # the iterative star loop itself, value-hash-checked over an
    # SQL-expressible edge set (recursive-CTE closure in DuckDB)
    register("er_cc_jaccard_clusters", cc_jaccard_clusters, CC_JACCARD_ORACLE)
    _loaded = True
