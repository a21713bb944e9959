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
from pyspark.sql.types import ArrayType, LongType, StringType

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
