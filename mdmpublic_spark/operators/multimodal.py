"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; the decode/feature steps are Arrow-batched
``mapInPandas`` operators. The decode itself is STUBBED in this
environment (no image/audio libraries in the container) behind
``decoder=`` hooks: the default is a deterministic fake that derives
features from the raw bytes, so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is real and fully tested,
and a real decoder (PIL/ffmpeg) drops in as one function.

Reference analog: the ops layer ships opaque binary artifacts with
side metadata and checksum manifests (package fan-out + sha1 manifests,
/root/reference/jenkins_scripts/jenkins/jenkins_code_build.sh:90-94,
load_offline_package.sh:95-118).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def as_media(df: DataFrame, id_col, payload_col, kind: str, mime: str) -> DataFrame:
    """Wrap any (id, binary) pair into the standard media schema —
    checksum + size computed natively (sha2/length are codegen'd)."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def fake_decode_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decode→embed step: a byte-level
    histogram projection. Pure function of the payload bytes.

    Replace with e.g. PIL decode + model embed in production:
    raise NotImplementedError there if the codec is unavailable.
    """
    if not payload:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    total = hist.sum()
    return (hist / total).astype(np.float32).tolist()


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decoder: Callable[[bytes, int], list[float]] = fake_decode_features,
    batch_rows: int = 256,
) -> DataFrame:
    """media → FEATURE_SCHEMA rows via mapInPandas (Arrow batches).

    mapInPandas (not a scalar UDF) because real decoders want batch
    control: bounded memory per batch of payloads, early drop of the
    payload column, one output row per input row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": chunk["n_bytes"].values,
                        "feature": [
                            decoder(p if p is not None else b"", dim)
                            for p in chunk["payload"]
                        ],
                    }
                )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame-sampling *plan* (stub): emit (media_id, offset) rows
    for every sampled frame position — posexplode over a computed
    offset array, no decode. A real sampler replaces offsets with
    decoded frames in the same schema shape."""
    n_frames = F.greatest(
        F.lit(1), (F.col("n_bytes") / F.lit(every_n_bytes)).cast("int")
    )
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_i"),
    ).select(
        "media_id",
        "frame_no",
        (F.col("frame_no") * every_n_bytes).alias("byte_offset"),
    )


def fake_resize(payload: bytes, target_bytes: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: uniform byte
    subsampling down to ``target_bytes`` (payloads already at or under
    target pass through unchanged). Pure function of the input bytes.
    A real implementation decodes the image, resizes to the target
    pixel box, and re-encodes — dropping in here unchanged; raise
    NotImplementedError there if the codec is unavailable."""
    if not payload or len(payload) <= target_bytes:
        return payload
    idx = np.linspace(0, len(payload) - 1, target_bytes).astype(np.int64)
    return bytes(np.frombuffer(payload, dtype=np.uint8)[idx])


def resize_media(
    media: DataFrame,
    target_bytes: int = 256,
    resizer: Callable[[bytes, int], bytes] = fake_resize,
) -> DataFrame:
    """media → media with resized payloads (MEDIA_SCHEMA preserved):
    n_bytes and sha256 are recomputed for the new payload so downstream
    manifest/dedup operators see a consistent record.

    mapInPandas for the same reason as extract_features: real resizers
    want batch control and bounded per-batch payload memory; the
    payload column is rewritten in place of the Arrow batch, one output
    row per input row, order within partitions preserved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resizer(p if p is not None else b"", target_bytes)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": out,
                    "mime": pdf["mime"].values,
                    "n_bytes": [len(p) for p in out],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in out],
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def resize_plan(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """The plan-side arithmetic of resize_media, fully native (no UDF,
    oracle-checkable): per media item, the output size and whether the
    payload shrinks. At scale this is the skip-list that lets the
    expensive resize pass read only the rows it will change."""
    return media.select(
        "media_id",
        F.col("n_bytes").alias("in_bytes"),
        F.least(F.col("n_bytes"), F.lit(target_bytes).cast("long")).alias("out_bytes"),
        (F.col("n_bytes") > F.lit(target_bytes)).alias("resized"),
    )


def payload_checksum_py(payload: bytes) -> str:
    """Python-side sha256 used by tests to cross-check the native sha2."""
    return hashlib.sha256(payload).hexdigest()
