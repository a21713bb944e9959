"""Deterministic text extraction + normalization (SURVEY.md §2.10).

The BASELINE invariant is *byte-identical extracted text per url* across runs
and parallelism levels, so everything here is a pure function of the input
bytes: no locale, no wall clock, no dict-ordering hazards, no external C
library whose version could drift. Reference behavior being reproduced: the
MDM staging→master document flow canonicalizes records before matching
(closed engine, config-visible only — see SURVEY.md §3.4); the executable
analog in the reference is its regex field-carving + whitespace collapsing
(/root/reference/python/tcp_port_scan/tcp_port_scan.py:49-51,
 /root/reference/jenkins_scripts/report/ssh_login_report.sh:152-178).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

# --- pure string functions (usable from both the generator and the UDFs) ---

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
# fixed, ordered entity table — a dict literal keeps insertion order in
# Python 3.7+, so replacement order is deterministic
_ENTITIES = {
    "&nbsp;": " ",
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
}

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def extract_text_str(html: str) -> str:
    """HTML → visible text. Pure, byte-deterministic."""
    s = _SCRIPT_STYLE_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, rep in _ENTITIES.items():
        s = s.replace(ent, rep)
    return _WS_RE.sub(" ", s).strip()


def extract_text_bytes(html: bytes) -> str:
    return extract_text_str(html.decode("utf-8", errors="replace"))


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.S | re.I)


def extract_title_str(html: str, max_chars: int = 200) -> str:
    """<title> contents → cleaned text (pure, byte-deterministic).

    Scoring compares *real* titles, never a text prefix: a prefix proxy
    drags shared navigation boilerplate into the similarity window and
    inflates Jaro-Winkler between unrelated same-template pages."""
    m = _TITLE_RE.search(html)
    if not m:
        return ""
    s = _TAG_RE.sub(" ", m.group(1))
    for ent, rep in _ENTITIES.items():
        s = s.replace(ent, rep)
    return _WS_RE.sub(" ", s).strip()[:max_chars]


def extract_title_bytes(html: bytes) -> str:
    return extract_title_str(html.decode("utf-8", errors="replace"))


def normalize_str(text: str) -> str:
    """Matching canonicalization: lowercase + alnum-token stream."""
    return " ".join(_TOKEN_RE.findall(text.lower()))


def tokens_str(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def shingles_str(text: str, k: int = 3) -> list[str]:
    """k-word shingles of the normalized token stream (deduped, order kept)."""
    toks = tokens_str(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    seen: dict[str, None] = {}
    for i in range(len(toks) - k + 1):
        seen.setdefault(" ".join(toks[i : i + k]), None)
    return list(seen.keys())


# --- vectorized (Arrow) UDFs ---


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


@F.pandas_udf(StringType())
def extract_title(html: pd.Series) -> pd.Series:
    return html.map(extract_title_bytes)


_PAGE_SCHEMA = StructType(
    [StructField("text", StringType()), StructField("title", StringType())]
)


@F.pandas_udf(_PAGE_SCHEMA)
def extract_page(html: pd.Series) -> pd.DataFrame:
    """text + title in ONE Arrow crossing — separate UDFs ship every html
    blob through Arrow twice (html is the widest column in the pipeline)."""
    def both(b: bytes) -> tuple[str, str]:
        s = b.decode("utf-8", errors="replace")
        return extract_text_str(s), extract_title_str(s)

    text, title = zip(*html.map(both)) if len(html) else ((), ())
    return pd.DataFrame({"text": list(text), "title": list(title)})


@F.pandas_udf(StringType())
def normalize_text(text: pd.Series) -> pd.Series:
    return text.map(normalize_str)


@F.pandas_udf(ArrayType(StringType()))
def shingles(text: pd.Series) -> pd.Series:
    return text.map(shingles_str)


@F.pandas_udf(ArrayType(StringType()))
def text_tokens(text: pd.Series) -> pd.Series:
    return text.map(tokens_str)


@F.pandas_udf(LongType())
def token_count(text: pd.Series) -> pd.Series:
    return text.map(lambda t: len(_TOKEN_RE.findall(t.lower())))


# --- native-function helpers (JVM-side, codegen'd — preferred hot path) ---


def tokens_expr(text_col, max_tokens: int | None = None):
    """JVM tokenization, equivalent to ``tokens_str``: lowercase, split on
    non-alnum runs, drop empties (split/filter/slice stay in codegen)."""
    toks = F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    return F.slice(toks, 1, max_tokens) if max_tokens else toks


def shingles_from_tokens(toks_attr):
    """3-word shingles (distinct) of a **materialized** token-array column.

    ``toks_attr`` MUST be a plain column reference, not a composite
    expression: ``F.get(expr, i)`` inside the transform lambda re-evaluates
    ``expr`` per element — O(n²) per row (measured 10x stage blowup).
    Project the token array into its own select first; a multiply-
    referenced non-trivial alias survives CollapseProject.

    Matches ``shingles_str`` semantics: n<3 → the whole token stream as
    one shingle; empty → empty array."""
    n = F.size(toks_attr)
    sh = (
        F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(0), n - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.get(toks_attr, i),
                    F.get(toks_attr, i + 1),
                    F.get(toks_attr, i + 2),
                ),
            ),
        )
        .when(n > 0, F.array(F.concat_ws(" ", toks_attr)))
        .otherwise(F.array().cast("array<string>"))
    )
    return F.array_distinct(sh)


def token_hashes_expr(toks_attr):
    """xxhash64 of each token of a **materialized** token-array column —
    each token's string is hashed exactly once; all downstream shingle
    work is long arithmetic."""
    return F.transform(toks_attr, lambda t: F.xxhash64(t))


def shingle_hashes_from_token_hashes(th_attr):
    """Distinct 64-bit shingle ids of the 3-word shingles, computed from a
    **materialized** token-hash array (see ``token_hashes_expr``) — no
    shingle string is ever built and no token string is hashed twice.

    ``xxhash64(h_i, h_{i+1}, h_{i+2})`` chains the three 8-byte token
    hashes (no concat ambiguity — tokens hash individually). The
    string-shingle variant left profile/block/features allocation-bound
    at 32 local cores (GC-limited, near-zero 8→32 scaling at 800k
    pages); this keeps the whole map side in primitive longs. Same n<3
    fallback as ``shingles_from_tokens``: the whole token stream as one
    shingle (chain of all its hashes, here n ∈ {1,2}); empty → empty.

    Every consumer that must agree on shingle identity (the stop-shingle
    profile, LSH blocking, scoring suppression) derives from THIS
    function, so a shingle's 64-bit id has one definition everywhere.
    """
    n = F.size(th_attr)
    return F.array_distinct(
        F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(0), n - 3),
                lambda i: F.xxhash64(
                    F.get(th_attr, i),
                    F.get(th_attr, i + 1),
                    F.get(th_attr, i + 2),
                ),
            ),
        )
        .when(n == 2, F.array(F.xxhash64(F.get(th_attr, 0), F.get(th_attr, 1))))
        .when(n == 1, F.array(F.xxhash64(F.get(th_attr, 0))))
        .otherwise(F.array().cast("array<bigint>"))
    )


def norm_domain(url_col):
    """Normalized domain: host of the url, lowercased, `www.` stripped.

    Stays inside whole-stage codegen (parse_url/lower/regexp_replace are
    built-ins) — this is the cheap first-pass blocking key.
    """
    host = F.parse_url(url_col, F.lit("HOST"))
    return F.regexp_replace(F.lower(host), r"^www\.", "")


def title_expr(text_col, n: int = 80):
    """First n chars of the extracted text — the cheap 'title' proxy used by
    the string-similarity scorers (short strings keep Levenshtein O(n²) tiny)."""
    return F.substring(text_col, 1, n)
