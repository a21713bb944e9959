"""Stage 2 — multi-pass blocking: normalized-domain + MinHash-LSH band keys.

Reference analog: the MDM engine never compares all record pairs — it
*searches* an inverted index (`mdm_index`) for match candidates
(/root/reference/chef/setup_jenkins/jenkins_jobs/CollectFiles/config.xml:32,
SURVEY.md §1.1 J8). Blocking keys are the Spark-native inversion of that
index: a page "posts" itself under each of its keys, and candidate
retrieval becomes a self-join on the key — shuffled, not searched.

Two key families (multi-pass, per SURVEY.md §7.4 item 4 — one pass alone
cannot reach F1 ≥ 0.99 recall):
  * ``d:{normalized domain}`` — cheap, computed JVM-side (parse_url +
    regexp_replace stay inside whole-stage codegen; zero Python cost).
    Catches the common case of same-site near-duplicates.
  * ``b{i}:{band hash}`` — MinHash-LSH band keys over 3-word shingles of
    the normalized text; catches cross-domain duplicates. One Arrow
    batch crossing per page: a single pandas UDF goes text → normalize →
    shingle → 64-perm MinHash → 16 band keys (chaining separate UDFs
    would serialize the row through Python four times).

Scale notes (100 TB): output is (url, block_key) — long and narrow.
It is *not* repartitioned here; the pair join (operators/pairs.py) owns
the shuffle on block_key so the exchange happens exactly once. Band-key
cardinality grows with corpus size, so the key space never saturates;
domain keys are Zipf-skewed, which pairs.py handles (cap + hot-block
broadcast + AQE skew split).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from mdmpublic_spark.functions.hashing import lsh_band_keys, minhash_signature
from mdmpublic_spark.functions.text import (
    norm_domain,
    shingles_from_tokens,
    shingles_str,
    tokens_expr,
)

DOMAIN_PREFIX = "d:"


def common_shingles(
    pages: DataFrame, min_stop_df: int = 20, stop_frac: float = 0.005, n_docs: int | None = None
) -> DataFrame:
    """Corpus profile: shingles whose document frequency marks them as
    boilerplate ("stop shingles") → (shingle, df).

    Same-template pages share navigation/footer text; those shingles
    carry no identity signal but inflate both LSH candidate volume and
    containment scores (they caused measurable false cluster-merges on
    the fixtures). DF threshold = max(min_stop_df, stop_frac·n_docs):
    genuine duplicate content has DF ≈ cluster size (small), boilerplate
    has DF ≈ a constant fraction of the corpus, so the two are separable
    at any scale. The aggregation is one map-side-combined groupBy whose
    output is only the high-DF head (Zipf: tiny), safe to broadcast.
    """
    n = pages.count() if n_docs is None else n_docs  # callers with a committed
    # row count (stage manifests) pass it in — saves a full scan job
    thr = max(min_stop_df, int(stop_frac * n))
    # tokenize/shingle JVM-side (functions.text helpers) — the python
    # shingle UDF made this stage worker-bound; now it is one codegen'd
    # scan + explode + map-side-combined groupBy
    toks = pages.select(tokens_expr(F.col("text")).alias("toks"))
    return (
        toks.select(F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= thr)
    )


def make_lsh_udf(stop_bc=None):
    """Factory: text → LSH band keys, one Python crossing
    (normalize+shingle+stop-filter+minhash+band). ``stop_bc`` is a
    broadcast frozenset of stop shingles (corpus-adaptive boilerplate)."""

    @F.pandas_udf(ArrayType(StringType()))
    def lsh_keys_of_text(text: pd.Series) -> pd.Series:
        stop = stop_bc.value if stop_bc is not None else frozenset()

        def keys(t: str) -> list[str]:
            sh = [s for s in shingles_str(t) if s not in stop]
            # all-boilerplate page: no signal → no LSH keys (else every
            # such page would collide into one pathological block)
            return lsh_band_keys(minhash_signature(sh)) if sh else []

        return text.map(keys)

    return lsh_keys_of_text


def block_keys(
    pages: DataFrame,
    use_domain: bool = True,
    use_lsh: bool = True,
    min_text_chars: int = 1,
    stop_bc=None,
) -> DataFrame:
    """(url, text) → (url, block_key), one row per (page, key).

    Pages with empty/near-empty text get no LSH keys (their signatures
    would all collide into one pathological block — SURVEY.md §7.4
    item 2); they remain reachable via the domain key.
    """
    out = None
    if use_domain:
        dom = pages.select(
            "url", F.concat(F.lit(DOMAIN_PREFIX), norm_domain(F.col("url"))).alias("block_key")
        ).where(F.col("block_key").isNotNull())
        out = dom
    if use_lsh:
        lsh_udf = make_lsh_udf(stop_bc)
        lsh = (
            pages.where(F.length("text") >= min_text_chars)
            .select("url", F.explode(lsh_udf(F.col("text"))).alias("block_key"))
        )
        out = lsh if out is None else out.unionByName(lsh)
    if out is None:
        raise ValueError("at least one key family must be enabled")
    return out
