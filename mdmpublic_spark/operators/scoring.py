"""Stage 4 — batched pairwise scoring inside Arrow-vectorized UDFs.

Reference analog: the MDM engine scores candidate pairs on a bounded
computation pool (16..64 threads —
/root/reference/chef/setup_jenkins/jenkins_jobs/DeploySystem/config.xml:91-92,111);
our pool is the executor fleet, and each Arrow batch is one "work item".

Design for the 100 TB case:
  * **Score on capped representations, computed once per page.** The
    feature stage projects each page to (title ≤80 chars, first
    ``max_tokens`` normalized tokens). Pairs join against this narrow
    features table twice (a/b sides); the full text/html never enters
    the pair shuffle.
  * **Cheap-first cascade inside the UDF.** Token-set Jaccard gates the
    O(len²) metrics: pairs below ``gate`` skip Jaro-Winkler/Levenshtein
    entirely (they cannot reach the match threshold anyway). On skewed
    real data most candidate pairs die at the gate.
  * **One Python crossing per pair.** A single pandas UDF returns the
    full score struct; metrics are pure-Python/numpy (functions/
    similarity.py) so scores are bit-stable across library versions.

Score = 0.10·tokenJaccard + 0.20·shingleJaccard
        + 0.35·shingleContainment + 0.25·JW(title) + 0.10·levRatio(title).

Shingle **containment** (|A∩B| / min(|A|,|B|)) carries the largest
weight because the dominant near-duplicate transformation on the web is
*truncation* (one side is a prefix/subset of the other): plain Jaccard
collapses for short truncated docs while containment stays high.
Calibrated on the labeled fixtures (tools/calibrate.py): with
stop-shingle suppression and real <title> comparison the score gap is
positives ≥ 0.621 vs negatives ≤ 0.273; threshold 0.45 sits mid-gap,
and cluster transitivity rescues outlier pairs whose neighbors chain.
(tests/test_pipeline.py asserts pairwise F1 ≥ 0.99.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

from mdmpublic_spark.functions.similarity import jaccard_tokens, jaro_winkler, levenshtein_ratio
from mdmpublic_spark.functions.text import title_expr, tokens_str

SCORE_SCHEMA = StructType(
    [
        StructField("jac_token", DoubleType()),
        StructField("jac_shingle", DoubleType()),
        StructField("cont_shingle", DoubleType()),
        StructField("jw_title", DoubleType()),
        StructField("lev_title", DoubleType()),
        StructField("score", DoubleType()),
    ]
)

W_TOKEN, W_SHINGLE, W_CONT, W_JW, W_LEV = 0.10, 0.20, 0.35, 0.25, 0.10
GATE = 0.08  # token-jaccard below this cannot reach any sane threshold
# calibrated via tools/calibrate.py: positives ≥ 0.621, negatives ≤ 0.273
# (with stop-shingle suppression + real titles) — 0.45 sits mid-gap
DEFAULT_THRESHOLD = 0.45


def _shingle_set(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def score_rows(
    title_a: str,
    title_b: str,
    toks_a: list[str],
    toks_b: list[str],
    stop: frozenset = frozenset(),
) -> tuple[float, float, float, float, float, float]:
    """Pure scoring of one pair (unit-testable without Spark)."""
    jt = jaccard_tokens(toks_a, toks_b)
    if jt < GATE:
        # cascade short-circuit: cheap metric alone decides "no"
        return (jt, 0.0, 0.0, 0.0, 0.0, W_TOKEN * jt)
    sa, sb = _shingle_set(toks_a) - stop, _shingle_set(toks_b) - stop
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    js = inter / union if union else (1.0 if not sa and not sb else 0.0)
    cs = inter / min(len(sa), len(sb)) if sa and sb else 0.0
    ta, tb = title_a.lower(), title_b.lower()
    jw = jaro_winkler(ta, tb)
    lv = levenshtein_ratio(ta, tb)
    return (
        jt,
        js,
        cs,
        jw,
        lv,
        W_TOKEN * jt + W_SHINGLE * js + W_CONT * cs + W_JW * jw + W_LEV * lv,
    )


def _score_prepared(title_a, title_b, ts_a, sh_a, ts_b, sh_b):
    """Score one pair from prepared (token-set, shingle-set) features."""
    if not ts_a and not ts_b:
        jt = 1.0
    else:
        i = len(ts_a & ts_b)
        u = len(ts_a) + len(ts_b) - i
        jt = i / u if u else 0.0
    if jt < GATE:
        return (jt, 0.0, 0.0, 0.0, 0.0, W_TOKEN * jt)
    inter = len(sh_a & sh_b)
    union = len(sh_a) + len(sh_b) - inter
    js = inter / union if union else (1.0 if not sh_a and not sh_b else 0.0)
    cs = inter / min(len(sh_a), len(sh_b)) if sh_a and sh_b else 0.0
    ta, tb = title_a.lower(), title_b.lower()
    jw = jaro_winkler(ta, tb)
    lv = levenshtein_ratio(ta, tb)
    return (
        jt,
        js,
        cs,
        jw,
        lv,
        W_TOKEN * jt + W_SHINGLE * js + W_CONT * cs + W_JW * jw + W_LEV * lv,
    )


def make_score_udf(stop_bc=None):
    """Factory: pair-scoring pandas UDF closing over the broadcast
    stop-shingle set (boilerplate suppression — see blocking.py).

    A document appears in many candidate pairs, so token/shingle sets
    are memoized per url within each Arrow batch — set construction
    (O(tokens) per doc) happens once per distinct doc, not once per
    pair, which dominates scoring cost on block-heavy corpora.
    """

    @F.pandas_udf(SCORE_SCHEMA)
    def score_pair(
        url_a: pd.Series,
        url_b: pd.Series,
        title_a: pd.Series,
        title_b: pd.Series,
        toks_a: pd.Series,
        toks_b: pd.Series,
    ) -> pd.DataFrame:
        stop = stop_bc.value if stop_bc is not None else frozenset()
        feat_cache: dict = {}

        def feats(url, toks):
            f = feat_cache.get(url)
            if f is None:
                tl = [] if toks is None else list(toks)
                f = (set(tl), _shingle_set(tl) - stop)
                feat_cache[url] = f
            return f

        rows = []
        for ua, ub, a, b, ta, tb in zip(
            url_a, url_b, title_a, title_b, toks_a, toks_b
        ):
            ts_a, sh_a = feats(ua, ta)
            ts_b, sh_b = feats(ub, tb)
            rows.append(_score_prepared(a or "", b or "", ts_a, sh_a, ts_b, sh_b))
        return pd.DataFrame(rows, columns=[f.name for f in SCORE_SCHEMA.fields])

    return score_pair


@F.pandas_udf(ArrayType(StringType()))
def norm_tokens_capped(text: pd.Series) -> pd.Series:
    # bound is applied inside the UDF (config captured at plan build)
    return text.map(lambda t: tokens_str(t)[:_MAX_TOKENS])


_MAX_TOKENS = 1024


def page_features(pages: DataFrame, title_chars: int = 80) -> DataFrame:
    """(url, text[, title]) → (url, title, tokens) — the narrow scoring
    projection. Uses the real html <title> when present; empty titles
    fall back to a text prefix (JVM-side coalesce, no Python cost)."""
    if "title" in pages.columns:
        title = F.coalesce(
            F.nullif(F.col("title"), F.lit("")), title_expr(F.col("text"), title_chars)
        )
    else:
        title = title_expr(F.col("text"), title_chars)
    return pages.select(
        "url",
        title.alias("title"),
        norm_tokens_capped(F.col("text")).alias("tokens"),
    )


def score_pairs(
    pairs: DataFrame,
    features: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    stop_bc=None,
):
    """pairs(url_a,url_b) ⨝ features×2 → scored pairs; returns (scored, edges).

    The features join is a plain shuffle equi-join on url (uniform key, no
    skew); at cluster scale pre-bucketing the features table by url makes
    both joins co-located (bucketed Iceberg write — see tables.py note).
    """
    fa = features.select(
        F.col("url").alias("url_a"), F.col("title").alias("title_a"), F.col("tokens").alias("toks_a")
    )
    fb = features.select(
        F.col("url").alias("url_b"), F.col("title").alias("title_b"), F.col("tokens").alias("toks_b")
    )
    score_udf = make_score_udf(stop_bc)
    scored = (
        pairs.join(fa, "url_a")
        .join(fb, "url_b")
        .withColumn(
            "s", score_udf("url_a", "url_b", "title_a", "title_b", "toks_a", "toks_b")
        )
        .select("url_a", "url_b", "s.*")
    )
    edges = scored.where(F.col("score") >= threshold).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst"), "score"
    )
    return scored, edges
