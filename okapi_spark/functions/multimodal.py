"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no codec libraries, so the DECODE step is stubbed
(NotImplementedError) or replaced by a deterministic fake — but the
Spark-side plumbing is real and tested: typed binary+metadata schema,
Arrow-batched ``mapInPandas`` with bounded batch sizes, partition-count
preservation, and a feature-table output contract matching what a real
decoder (PIL/ffmpeg on the cluster image) would slot into.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes int, sha256 string, feature array<float>"


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(0, n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.sha2(F.concat(F.lit("payload:"), F.col("id").cast("string"), F.lit(f":{seed}")), 256)
        .cast("binary")
        .alias("payload"),
    )
    return df


def decode_image(payload: bytes):  # pragma: no cover - real codec absent
    """Real decoder slot. Container ships no PIL/cv2 — STUB."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg on the cluster image; "
        "wire the real decoder here (signature: bytes -> HxWxC uint8)"
    )


def extract_features(
    media: DataFrame, feature_dim: int = 8, batch_size: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Uses a deterministic hash-derived fake feature vector in place of
    a real model/codec, but the execution shape — ``mapInPandas`` with
    bounded batches, no driver collect, schema-stable output — is the
    production path a real extractor drops into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                payloads = chunk["payload"]
                shas = [hashlib.sha256(p or b"").hexdigest() for p in payloads]
                feats = [
                    np.frombuffer(
                        hashlib.sha256((s + "#feat").encode()).digest()[: 4 * feature_dim],
                        dtype=np.uint8,
                    ).astype(np.float32)[:feature_dim]
                    / 255.0
                    for s in shas
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "n_bytes": [len(p or b"") for p in payloads],
                        "sha256": shas,
                        "feature": feats,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)
