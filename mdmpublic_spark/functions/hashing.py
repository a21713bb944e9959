"""MinHash / SimHash / fingerprint functions — deterministic, vectorized.

Determinism contract (SURVEY.md §7.4 item 5): every hash seed is a fixed
constant derived from the permutation index, never from partitioning, time,
or ``rand()`` — signatures are a pure function of the token multiset, so the
same page gets the same LSH keys at local[8] and local[32].

Reference analog: the MDM engine blocks match candidates via an inverted
index (`mdm_index`, /root/reference/chef/setup_jenkins/jenkins_jobs/
CollectFiles/config.xml:32); md5-derived names appear at
/root/reference/python/db_backup/es_backup.py:61. Our MinHash-LSH band keys
play that index's role (SURVEY.md §1.1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

# Mersenne prime 2^61-1 — classic universal-hash modulus; fits products of
# 61-bit values in uint128-free numpy via Python ints? No — we stay in uint64
# with wrapping multiply + xor-fold, which is well-defined in numpy and
# deterministic across platforms.
_U64 = np.uint64

NUM_PERM = 64  # minhash signature length
# 21 bands × 3 rows (63 of 64 perms): calibrated on the labeled fixtures —
# 16×4 missed 6/95 cross-domain positives (perturbed-vs-perturbed pairs sit
# near shingle-jaccard 0.35, where P[4-row band agrees] ≈ 0.015); 21×3 missed
# 1/95 with only 1/495 negatives gaining a shared key. r=3 keeps the candidate
# volume at web scale bounded: unrelated pages share ~no 3-shingles, so
# P[3-row agreement] is cubically suppressed.
LSH_BANDS = 21
LSH_ROWS = 3

# fixed per-permutation odd multipliers/offsets, derived from sha256 of the
# permutation index — reproducible from source alone
def _seed_params(n: int) -> tuple[np.ndarray, np.ndarray]:
    a = np.empty(n, dtype=_U64)
    b = np.empty(n, dtype=_U64)
    for i in range(n):
        d = hashlib.sha256(f"mdmpublic-minhash-{i}".encode()).digest()
        a[i] = _U64(int.from_bytes(d[:8], "big") | 1)  # odd multiplier
        b[i] = _U64(int.from_bytes(d[8:16], "big"))
    return a, b


_A, _B = _seed_params(NUM_PERM)


def _hash64_str(s: str) -> int:
    """Stable 64-bit hash of a string (sha1-fold; no PYTHONHASHSEED hazard)."""
    return int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big")


def minhash_signature(shingle_list: list[str]) -> list[int]:
    """64-permutation MinHash signature of a shingle set (as int64 list)."""
    if not shingle_list:
        return [0] * NUM_PERM
    h = np.fromiter((_hash64_str(s) for s in shingle_list), dtype=_U64, count=len(shingle_list))
    # (a*h + b) with uint64 wraparound, min over shingles per permutation
    sig = (np.multiply.outer(_A, h) + _B[:, None]).min(axis=1)
    # reinterpret as signed int64 for Spark LongType
    return sig.astype(np.int64).tolist()


def lsh_band_keys(sig: list[int]) -> list[str]:
    """LSH band keys: 16 bands of 4 signature slots each, rendered as strings
    (band index prefixed so bands never collide across positions)."""
    return [
        f"b{band}:" + "-".join(str(v) for v in sig[band * LSH_ROWS : (band + 1) * LSH_ROWS])
        for band in range(LSH_BANDS)
    ]


def band_count() -> int:
    return LSH_BANDS


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over the token multiset (sign of per-bit vote sums)."""
    if not tokens:
        return 0
    bits = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = _hash64_str(t)
        for b in range(64):
            bits[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(64):
        if bits[b] > 0:
            v |= 1 << b
    return v - (1 << 64) if v >= 1 << 63 else v  # to signed int64


def rolling_fingerprint(text: str, window: int = 8, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: rolling hash over byte windows,
    keep the `keep` smallest window hashes (deterministic, order-free)."""
    data = text.encode("utf-8")
    if len(data) <= window:
        return [_hash64_str(text) - (1 << 63)]
    arr = np.frombuffer(data, dtype=np.uint8).astype(_U64)
    mult = _U64(1099511628211)  # FNV prime
    h = np.zeros(len(data) - window + 1, dtype=_U64)
    acc = np.zeros_like(h)
    for i in range(window):
        acc = acc * mult + arr[i : i + len(h)]
    h = acc
    smallest = np.sort(h)[:keep]
    return (smallest.astype(np.int64)).tolist()


# --- vectorized UDFs ---


@F.pandas_udf(ArrayType(LongType()))
def minhash_sig(shingle_col: pd.Series) -> pd.Series:
    return shingle_col.map(lambda sh: minhash_signature(list(sh)))


@F.pandas_udf(ArrayType(StringType()))
def lsh_keys(sig_col: pd.Series) -> pd.Series:
    return sig_col.map(lambda s: lsh_band_keys(list(s)))


@F.pandas_udf(LongType())
def simhash(tokens_col: pd.Series) -> pd.Series:
    return tokens_col.map(lambda t: simhash64(list(t)))


@F.pandas_udf(ArrayType(LongType()))
def fingerprint(text_col: pd.Series) -> pd.Series:
    return text_col.map(rolling_fingerprint)
