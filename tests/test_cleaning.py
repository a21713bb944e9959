"""Semantic checks for the corpus-cleaning operators (operators/cleaning.py)
on crafted inputs — the oracle-parity test covers the driver entries;
these pin the operator semantics themselves."""

from __future__ import annotations

import pytest

from mdmpublic_spark.operators.cleaning import (
    pii_scrub,
    quota_sample,
    repetition_stats,
    span_dedup,
)


def _df(spark, rows, schema="doc_id bigint, text string"):
    return spark.createDataFrame(rows, schema)


def test_span_dedup_flags_shared_spans(spark):
    # docs 1 and 2 share their first 4-token span; doc 3 is unique
    rows = [
        (1, "a b c d x1 y1"),
        (2, "a b c d x2 y2"),
        (3, "p q r s t u"),
    ]
    out = {
        r["doc_id"]: r
        for r in span_dedup(_df(spark, rows), span_tokens=4).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_spans"] == 2 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_spans"] == 2 and out[3]["n_dup_spans"] == 0
    # survivors of 1 and 2 differ (their unique tails), 3 keeps all
    assert out[1]["clean_md5"] != out[2]["clean_md5"]
    import hashlib

    assert out[3]["clean_md5"] == hashlib.md5(b"p q r s t u").hexdigest()


def test_span_dedup_fully_duplicated_doc_empties(spark):
    import hashlib

    rows = [(1, "a b c"), (2, "a b c")]
    out = span_dedup(_df(spark, rows), span_tokens=4).collect()
    for r in out:
        assert r["n_dup_spans"] == 1
        assert r["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_pii_scrub_counts_and_redacts(spark):
    rows = [(1, "write bob.smith+x@corp.example.org from 10.1.2.3 or call 555-0199 now")]
    r = pii_scrub(_df(spark, rows)).collect()[0]
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)
    import hashlib

    want = "write <EMAIL> from <IP> or call <PHONE> now"
    assert r["scrubbed_md5"] == hashlib.md5(want.encode()).hexdigest()


def test_repetition_stats_fractions(spark):
    # 6 tokens: a a a b b c → distinct 3, top token a (3/6),
    # bigrams: "a a" x2, "a b", "b b", "b c" → top 2/5
    rows = [(1, "a a a b b c")]
    r = repetition_stats(_df(spark, rows)).collect()[0]
    assert r["n_tokens"] == 6 and r["n_distinct"] == 3
    assert r["dup_token_frac"] == pytest.approx(0.5)
    assert r["top_token_frac"] == pytest.approx(3 / 6)
    assert r["top_bigram_frac"] == pytest.approx(2 / 5)


def test_repetition_stats_single_token_doc(spark):
    r = repetition_stats(_df(spark, [(1, "solo")])).collect()[0]
    assert r["n_tokens"] == 1 and r["top_bigram_frac"] == 0.0


def test_quota_sample_deterministic_and_quota_bounded(spark):
    rows = [(i, "tok " * 5, ["en", "zh"][i % 2]) for i in range(400)]
    df = spark.createDataFrame(
        [(i, t.strip(), lang) for i, t, lang in rows],
        "doc_id bigint, text string, lang string",
    )
    a = sorted(r["doc_id"] for r in quota_sample(df).collect())
    b = sorted(r["doc_id"] for r in quota_sample(df).collect())
    assert a == b and len(a) > 0
    out = quota_sample(df).collect()
    # every kept row's bucket is under its language quota
    for r in out:
        assert r["bucket"] < {"en": 50, "zh": 10}[r["lang"]]
    # en kept near 50%, zh near 10% (md5 buckets are near-uniform)
    n_en = sum(1 for r in out if r["lang"] == "en")
    n_zh = sum(1 for r in out if r["lang"] == "zh")
    assert 0.35 * 200 <= n_en <= 0.65 * 200
    assert n_zh <= 0.25 * 200
    assert all(r["n_tokens"] == 5 for r in out)


def test_null_text_agrees_with_oracle_convention(spark):
    """NULL text must not emit phantom spans (size(null)=-1 used to
    reach sequence(0,-1)) and must match the DuckDB-oracle convention:
    span_dedup drops the doc (no spans), quota_sample reports 0 tokens."""
    rows = [(1, None), (2, "a b c d")]
    sd = {r["doc_id"]: r for r in span_dedup(_df(spark, rows), span_tokens=2).collect()}
    assert 1 not in sd  # no phantom null spans, doc dropped like unnest([])
    assert sd[2]["n_spans"] == 2 and sd[2]["n_dup_spans"] == 0
    qdf = spark.createDataFrame(
        [(1, None, "en"), (2, "a b", "en")], "doc_id bigint, text string, lang string"
    )
    qs = {r["doc_id"]: r for r in quota_sample(qdf, quotas={"en": 100}).collect()}
    assert qs[1]["n_tokens"] == 0 and qs[2]["n_tokens"] == 2
