"""Corpus-cleaning registry entries over the driver's `documents`
table: span-level exact dedup, PII scrubbing, Gopher repetition
signals, and deterministic training-mix sampling — the web-corpus
preparation family (C4 §2.2 line dedup, Gopher §A1.1 repetition rules,
RefinedWeb-style mixing), each with an exact DuckDB oracle.

The PII entry injects deterministic synthetic PII (an email, an IPv4,
a phone) derived from doc_id into every document BEFORE scrubbing —
the driver's corpus contains no natural PII, so the injection is what
makes the counts and redaction a real test rather than an all-zeros
pass.  The injection expression is part of the query on BOTH sides
(Spark and oracle), so the redaction machinery is what's compared.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mdmpublic_spark.operators.cleaning import (
    DEFAULT_QUOTAS,
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    SPAN_TOKENS,
    pii_scrub,
    quota_sample,
    repetition_stats,
    span_dedup,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def dd_span_dedup(spark, sf_dir):
    """Corpus-wide span-level exact dedup (C4-style): 10-token spans,
    global span counts keyed on xxhash64, per-doc survivor reassembly."""
    return span_dedup(_docs(spark, sf_dir))


def _inject_pii(docs):
    """Deterministic synthetic PII per doc_id (mirrored verbatim in the
    oracle SQL below)."""
    d = F.col("doc_id")
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@mail.example.com ip 10.0."),
            (d % 256).cast("string"),
            F.lit("."),
            (d % 100).cast("string"),
            F.lit(" call 555-"),
            (F.lit(1000) + d % 9000).cast("string"),
        ),
    )


def ta_pii_scrub(spark, sf_dir):
    """PII counting + redaction over documents with injected synthetic
    PII; output fingerprints the redacted text."""
    return pii_scrub(_inject_pii(_docs(spark, sf_dir)))


def ta_repetition_stats(spark, sf_dir):
    """Gopher repetition quality signals per document."""
    return repetition_stats(_docs(spark, sf_dir))


def ta_quota_sample(spark, sf_dir):
    """Deterministic per-language training-mix sample with per-row
    token counts."""
    return quota_sample(_docs(spark, sf_dir))


_SPLIT = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"
_INJECT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST(doc_id % 100 AS VARCHAR)"
    " || ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)"
)
_CASE_QUOTA = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {pct}" for lang, pct in DEFAULT_QUOTAS.items()
) + " ELSE 0 END"
_HEXPOS = "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1"

ORACLES: dict[str, str] = {
    "dd_span_dedup": f"""
WITH base AS (
  SELECT doc_id, {_SPLIT} AS l FROM documents
),
toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord FROM base
),
spans AS (
  SELECT doc_id, CAST(floor((ord - 1) / {SPAN_TOKENS}) AS INT) AS span_idx,
         string_agg(tok, ' ' ORDER BY ord) AS span_text
  FROM toks GROUP BY 1, 2
),
counts AS (
  SELECT span_text, count(*) AS c FROM spans GROUP BY 1
),
flagged AS (
  SELECT s.doc_id, s.span_idx, s.span_text, c.c > 1 AS dup
  FROM spans s JOIN counts c USING (span_text)
)
SELECT doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       md5(coalesce(
         string_agg(CASE WHEN NOT dup THEN span_text END, ' ' ORDER BY span_idx),
         '')) AS clean_md5
FROM flagged GROUP BY doc_id
""",
    "ta_pii_scrub": f"""
WITH injected AS (
  SELECT doc_id, lower({_INJECT}) AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{IP_RE}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IP_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM injected
""",
    "ta_repetition_stats": f"""
WITH base AS (
  SELECT doc_id, {_SPLIT} AS l FROM documents
),
toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord FROM base
),
tc AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
),
uni AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct, max(c) AS max_tok
  FROM tc GROUP BY 1
),
bg0 AS (
  SELECT doc_id,
         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bg
  FROM toks
),
bgc AS (
  SELECT doc_id, bg, count(*) AS c FROM bg0 WHERE bg IS NOT NULL GROUP BY 1, 2
),
bi AS (
  SELECT doc_id, max(c) AS max_bigram, CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM bgc GROUP BY 1
)
SELECT u.doc_id, u.n_tokens, u.n_distinct,
       (u.n_tokens - u.n_distinct) / CAST(u.n_tokens AS DOUBLE) AS dup_token_frac,
       max_tok / CAST(u.n_tokens AS DOUBLE) AS top_token_frac,
       coalesce(max_bigram / CAST(n_bigrams AS DOUBLE), 0.0) AS top_bigram_frac
FROM uni u LEFT JOIN bi USING (doc_id)
""",
    "ta_quota_sample": f"""
WITH b AS (
  SELECT doc_id, lang,
         CAST((({_HEXPOS.format(i=1)}) * 16 + ({_HEXPOS.format(i=2)})) % 100
              AS INT) AS bucket,
         CAST(len({_SPLIT}) AS INT) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, bucket, n_tokens
FROM b WHERE bucket < {_CASE_QUOTA}
""",
}

_FNS = {
    "dd_span_dedup": dd_span_dedup,
    "ta_pii_scrub": ta_pii_scrub,
    "ta_repetition_stats": ta_repetition_stats,
    "ta_quota_sample": ta_quota_sample,
}
