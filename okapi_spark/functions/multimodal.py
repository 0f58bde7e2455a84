"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no codec libraries (PIL/libjpeg/ffmpeg), so REAL
format decode is gated: payloads in the repo's own uncompressed
container formats (OKPX raw image, OKPA raw PCM audio — documented
below) decode end-to-end with pure NumPy, and anything else (JPEG,
PNG, WAV, ...) raises the honest NotImplementedError stub where the
production codec would slot in. The Spark-side plumbing is real and
tested either way: typed binary+metadata schema, Arrow-batched
``mapInPandas`` with bounded batch sizes, no driver collect, and a
schema-stable feature-table contract.

OKPX (image): b"OKPX" | u8 version | u16le width | u16le height |
u8 channels | raw uint8 pixels, row-major H*W*C.
OKPA (audio): b"OKPA" | u8 version | u32le sample_rate |
u32le n_samples | raw int16le PCM mono samples.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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

_IMG_MAGIC = b"OKPX"
_AUD_MAGIC = b"OKPA"


def encode_image(pixels: np.ndarray) -> bytes:
    """Pack an HxWxC (or HxW) uint8 array into the OKPX container."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return _IMG_MAGIC + struct.pack("<BHHB", 1, w, h, c) + arr.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """bytes -> HxWxC uint8. Real decode for the OKPX uncompressed
    container (pure NumPy, no codec libs needed); compressed formats
    (JPEG/PNG/...) need PIL/libjpeg on the cluster image and raise the
    documented stub error here."""
    if payload is not None and payload[:4] == _IMG_MAGIC:
        if len(payload) < 10:  # magic(4) + <BHHB header(6)
            raise ValueError(f"OKPX header truncated: {len(payload)} bytes")
        ver, w, h, c = struct.unpack_from("<BHHB", payload, 4)
        if ver != 1:
            raise ValueError(f"OKPX version {ver} not supported")
        body = np.frombuffer(payload, dtype=np.uint8, offset=10)
        if body.size != h * w * c:
            raise ValueError(f"OKPX payload truncated: {body.size} != {h}*{w}*{c}")
        return body.reshape(h, w, c)
    raise NotImplementedError(
        "compressed image decode requires PIL/libjpeg on the cluster image; "
        "wire the real decoder here (signature: bytes -> HxWxC uint8)"
    )


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """bytes -> (sample_rate, int16 mono samples) for the OKPA
    container; compressed audio (mp3/ogg/...) raises the codec stub."""
    if payload is not None and payload[:4] == _AUD_MAGIC:
        if len(payload) < 13:  # magic(4) + <BII header(9)
            raise ValueError(f"OKPA header truncated: {len(payload)} bytes")
        ver, rate, n = struct.unpack_from("<BII", payload, 4)
        if ver != 1:
            raise ValueError(f"OKPA version {ver} not supported")
        body_bytes = len(payload) - 13
        if body_bytes % 2 or body_bytes != 2 * n:
            raise ValueError(f"OKPA payload truncated: {body_bytes} body bytes != 2*{n}")
        samples = np.frombuffer(payload, dtype="<i2", offset=13)
        return rate, samples
    raise NotImplementedError(
        "compressed audio decode requires ffmpeg/libsndfile on the cluster image"
    )


def _synth_payload(media_id: int, kind: str, seed: int) -> tuple[bytes, int, int, int]:
    """Deterministic raw payload for one media row:
    (payload, width, height, duration_ms)."""
    rng = np.random.RandomState((media_id * 2654435761 + seed) & 0x7FFFFFFF)
    if kind == "image":
        w = 8 + int(media_id) % 9
        h = 6 + (int(media_id) // 3) % 7
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
        return encode_image(px), w, h, 0
    if kind == "audio":
        rate, n = 8000, 800 + int(media_id) % 400
        samples = rng.randint(-(2**15), 2**15, size=n, dtype=np.int64).astype("<i2")
        payload = _AUD_MAGIC + struct.pack("<BII", 1, rate, n) + samples.tobytes()
        return payload, 0, 0, int(n * 1000 / rate)
    # video: stays a genuinely opaque blob (no synthetic container) —
    # exercises the stub path end-to-end
    blob = hashlib.sha256(f"payload:{media_id}:{seed}".encode()).digest()
    return blob, 0, 0, 0


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. image/audio rows carry REAL
    decodable payloads in the OKPX/OKPA raw containers; video rows are
    opaque blobs (stub path). Generated distributed via mapInPandas —
    no driver-side materialization."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in it:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = kinds[hash_kind(mid, seed)]
                payload, w, h, dur = _synth_payload(mid, kind, seed)
                rows.append(
                    (
                        mid,
                        kind,
                        "application/octet-stream",
                        w or None,
                        h or None,
                        dur or None,
                        payload,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "mime",
                    "width",
                    "height",
                    "duration_ms",
                    "payload",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def hash_kind(media_id: int, seed: int) -> int:
    """Deterministic 0/1/2 kind index (stable across Python runs)."""
    return int(hashlib.sha256(f"kind:{media_id}:{seed}".encode()).digest()[0]) % 3


def _image_feature(px: np.ndarray, feature_dim: int) -> np.ndarray:
    """Real pixel-derived feature: per-channel mean/std then a coarse
    luminance histogram filling the remaining dims. Vectorized NumPy
    over the decoded array."""
    flat = px.reshape(-1, px.shape[2]).astype(np.float32)
    stats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)]) / 255.0
    lum = flat.mean(axis=1)
    nbins = max(1, feature_dim - stats.size)
    hist, _ = np.histogram(lum, bins=nbins, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(1, lum.size)
    feat = np.concatenate([stats, hist])[:feature_dim]
    return np.pad(feat, (0, feature_dim - feat.size)).astype(np.float32)


def _audio_feature(rate: int, samples: np.ndarray, feature_dim: int) -> np.ndarray:
    x = samples.astype(np.float32) / 2**15
    base = np.array(
        [x.mean(), x.std(), np.abs(x).max(), rate / 48000.0], dtype=np.float32
    )
    nbins = max(1, feature_dim - base.size)
    hist, _ = np.histogram(x, bins=nbins, range=(-1.0, 1.0))
    hist = hist.astype(np.float32) / max(1, x.size)
    feat = np.concatenate([base, hist])[:feature_dim]
    return np.pad(feat, (0, feature_dim - feat.size)).astype(np.float32)


def _hash_feature(sha: str, feature_dim: int) -> np.ndarray:
    """Deterministic fallback vector of EXACTLY feature_dim floats —
    one sha256 digest yields 32 bytes, so larger dims re-hash with a
    block counter (keeps the feature column rectangular alongside the
    decoded rows, which always pad to feature_dim)."""
    buf = b""
    block = 0
    while len(buf) < feature_dim:
        buf += hashlib.sha256(f"{sha}#feat{block}".encode()).digest()
        block += 1
    return np.frombuffer(buf[:feature_dim], dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(
    media: DataFrame, feature_dim: int = 8, batch_size: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Payloads in the OKPX/OKPA raw containers are genuinely DECODED
    (pure NumPy) and featurized from pixels/samples; other payloads
    (where a real codec would run) fall back to a deterministic
    hash-derived vector so the pipeline shape stays total. The
    execution shape — ``mapInPandas`` with bounded batches, no driver
    collect, schema-stable output — is the production path a real
    extractor drops into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                payloads = chunk["payload"]
                shas, feats = [], []
                for p in payloads:
                    p = bytes(p) if p is not None else b""
                    shas.append(hashlib.sha256(p).hexdigest())
                    try:
                        if p[:4] == _IMG_MAGIC:
                            feats.append(_image_feature(decode_image(p), feature_dim))
                        elif p[:4] == _AUD_MAGIC:
                            feats.append(_audio_feature(*decode_audio(p), feature_dim))
                        else:
                            feats.append(_hash_feature(shas[-1], feature_dim))
                    except (ValueError, struct.error, NotImplementedError):
                        # totality: an adversarial/truncated payload that
                        # merely carries the magic prefix must not fail
                        # the task — fall back like any undecodable blob
                        feats.append(_hash_feature(shas[-1], feature_dim))
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "n_bytes": [len(p or b"") for p in payloads],
                        "sha256": shas,
                        "feature": feats,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)
