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


def minhash_signature_u64(h: np.ndarray) -> list[int]:
    """64-permutation MinHash signature of a pre-hashed shingle set
    (uint64 element hashes) — (a·h + b) with uint64 wraparound, min over
    shingles per permutation; returned as a signed-int64 list for Spark
    LongType."""
    if h.size == 0:
        return [0] * NUM_PERM
    sig = (np.multiply.outer(_A, h) + _B[:, None]).min(axis=1)
    return sig.astype(np.int64).tolist()


def minhash_signature(shingle_list: list[str]) -> list[int]:
    """64-permutation MinHash signature of a shingle set (as int64 list)."""
    if not shingle_list:
        return [0] * NUM_PERM
    h = np.fromiter((_hash64_str(s) for s in shingle_list), dtype=_U64, count=len(shingle_list))
    return minhash_signature_u64(h)


def lsh_band_keys(sig: list[int], n_bands: int = LSH_BANDS, n_rows: int = LSH_ROWS) -> list[str]:
    """LSH band keys: ``n_bands`` bands of ``n_rows`` signature slots each
    (default 21×3, see LSH_BANDS above), rendered as strings with the band
    index prefixed so bands never collide across positions."""
    return [
        f"b{band}:" + "-".join(str(v) for v in sig[band * n_rows : (band + 1) * n_rows])
        for band in range(n_bands)
    ]


def band_keys_expr(sig_col, n_bands: int = LSH_BANDS, n_rows: int = LSH_ROWS):
    """JVM-side equivalent of ``lsh_band_keys`` over an array<long> signature
    column — transform/slice/concat_ws stay inside whole-stage codegen, so
    banding costs no Python crossing (the signature UDF is the only one)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda band: F.concat(
            F.lit("b"),
            band.cast("string"),
            F.lit(":"),
            F.concat_ws(
                "-",
                F.transform(
                    F.slice(sig_col, band * F.lit(n_rows) + 1, F.lit(n_rows)),
                    lambda v: v.cast("string"),
                ),
            ),
        ),
    )


def band_count() -> int:
    return LSH_BANDS


def _hash64_sha256(s: str) -> int:
    """Stable 64-bit hash: first 8 bytes (big-endian) of sha256. Chosen for
    simhash because DuckDB 1.x ships sha256 (not sha1), so an exact SQL
    oracle can recompute the same value as
    ``('0x' || substr(sha256(t), 1, 16))::UBIGINT``."""
    return int.from_bytes(hashlib.sha256(s.encode("utf-8")).digest()[:8], "big")


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over the token multiset (sign of per-bit vote sums).

    Vectorized: unpack all token-hash bits at once (numpy little-endian
    byte/bit order matches bit b == (h >> b) & 1 on little-endian hosts),
    sum votes per bit column, pack the sign pattern back into one uint64.

    Per-token hash is sha256-folded (``_hash64_sha256``) so the whole
    signature — and therefore the pigeonhole-complete pair set built on
    it — is reproducible in ANSI-ish SQL (see the ``dd_simhash_pairs``
    oracle in queries/training_data.py). Tie votes (equal 1/0 counts on
    a bit) resolve to 0, matching the SQL ``vote > 0`` predicate.
    """
    if not tokens:
        return 0
    h = np.fromiter((_hash64_sha256(t) for t in tokens), dtype=_U64, count=len(tokens))
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(tokens)  # (+1/-1 per token)
    packed = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
    v = int(packed.view(_U64)[0])
    return v - (1 << 64) if v >= 1 << 63 else v  # to signed int64


_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def spark_hash32(s: str, seed: int = 42) -> int:
    """Spark's ``F.hash()`` of a string column, reproduced driver-side:
    Murmur3 x86_32 over the UTF-8 bytes with Spark's byte-wise tail mix
    (each trailing byte is mixed as its own signed-int block, unlike
    reference Murmur3) and default seed 42. Lets driver code pre-hash
    small lookup sets (e.g. stop shingles) into int32 plan literals that
    compare equal to JVM-hashed columns — no Spark job, no string
    literals in the plan. Parity is pinned by a test against F.hash."""
    data = s.encode("utf-8")
    h1 = seed & _M32
    n_aligned = len(data) - len(data) % 4
    for i in range(0, n_aligned, 4):
        block = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(block))
    for i in range(n_aligned, len(data)):
        b = data[i]
        b = b - 256 if b >= 128 else b  # Spark mixes *signed* tail bytes
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= 1 << 31 else h1  # to signed int32


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


@F.pandas_udf(ArrayType(LongType()))
def minhash_sig_hashed(h_col: pd.Series) -> pd.Series:
    """Signature from JVM-hashed shingles (array<long> of xxhash64 values,
    reinterpreted as uint64). The Arrow crossing carries only int64
    arrays — no per-shingle string materialization — and the whole body
    is numpy; this is the hot-path variant used by blocking."""
    return h_col.map(
        lambda arr: minhash_signature_u64(
            np.asarray(arr, dtype=np.int64).view(_U64)
        )
    )


@F.pandas_udf(ArrayType(StringType()))
def lsh_keys(sig_col: pd.Series) -> pd.Series:
    return sig_col.map(lambda s: lsh_band_keys(list(s)))


@F.pandas_udf(LongType())
def simhash(tokens_col: pd.Series) -> pd.Series:
    return tokens_col.map(lambda t: simhash64(list(t)))


@F.pandas_udf(ArrayType(LongType()))
def fingerprint(text_col: pd.Series) -> pd.Series:
    return text_col.map(rolling_fingerprint)
