"""Driver-gate emulation: every queries() entry vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row count + schema + value
hash after sorting columns by name) at sf=0.01, but stricter on floats:
we require exact bit equality — the decimal-sum discipline in
queries/relational.py is designed to deliver it.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLE_NAMES = sorted(entrymod.oracle_sql())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            bad = ~((a == b) | (a.isna() & b.isna()))
            assert not bad.any(), (
                f"{name}.{c}: {int(bad.sum())} float mismatches, "
                f"max diff {float((a - b).abs().max())}"
            )
        else:
            bad = ~((a == b) | (a.isna() & b.isna()))
            assert not bad.any(), f"{name}.{c}: {int(bad.sum())} mismatches"


def test_all_queries_have_callable():
    qs = entrymod.queries()
    assert len(qs) >= 25
    for name in ORACLE_NAMES:
        assert name in qs


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "cluster_id" in df.columns


def _unused(x):  # keep math import honest if float path changes
    return math.isnan(x)
