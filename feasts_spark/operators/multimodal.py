"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque BinaryType payloads with a typed metadata struct.
The Spark-side machinery — schemas, partition-friendly batching via
mapInPandas, Arrow-safe binary transport, bounded batch sizes — is real and
tested; the actual codecs are NOT available in this environment (no
PIL/ffmpeg/librosa), so the decode step is a deterministic fake behind
`decoder=` (production swaps in the real codec; `decoder=None` raises
NotImplementedError to make the stub explicit).

Scale notes: decode is a map-only pass — no shuffle; Arrow batch bytes are
bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` and the media
column should be stored in its own parquet column chunk so row-group
pruning skips payloads when only metadata is queried.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, "
    "codec:string>"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, feat_dim int"
THUMB_SCHEMA = "media_id long, width int, height int, thumb binary"
FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real codec: derives a pseudo-pixel/PCM
    array from the payload bytes. Used so the full pipeline (schema, batch
    shape, feature math) is executable and testable in this environment."""
    h = hashlib.sha256(payload).digest()
    seed = struct.unpack(">Q", h[:8])[0] % (2**32)
    rng = np.random.RandomState(seed)
    if kind == "image":
        return rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    if kind == "audio":
        return (rng.standard_normal(1024) * 0.1).astype(np.float32)
    if kind == "video":
        return rng.randint(0, 256, size=(8, 16, 16, 3)).astype(np.uint8)
    raise ValueError(f"unknown media kind: {kind}")


def extract_features(
    df: DataFrame,
    decoder=fake_decode,
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Decode + mean-pool feature per media row (map-only mapInPandas)."""
    if decoder is None:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "pass decoder=<codec fn> (payload, kind) -> ndarray"
        )

    def fn(batches):
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf[payload_col], pdf[kind_col]):
                arr = decoder(bytes(payload), kind).astype(np.float64)
                if arr.ndim >= 3:  # image/video: per-channel mean + std
                    flat = arr.reshape(-1, arr.shape[-1])
                    v = np.concatenate([flat.mean(axis=0), flat.std(axis=0)])
                else:  # audio: frame energy profile (8 bins)
                    chunks = np.array_split(arr, 8)
                    v = np.array([float(np.sqrt((c**2).mean())) for c in chunks])
                feats.append(v.astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf[kind_col],
                    "feature": feats,
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int = 8, height: int = 8, decoder=fake_decode
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode raw bytes."""
    if decoder is None:
        raise NotImplementedError("no codec available; pass decoder=")

    def fn(batches):
        for pdf in batches:
            thumbs = []
            for payload in pdf["payload"]:
                img = decoder(bytes(payload), "image")
                ys = (np.arange(height) * img.shape[0] // height)
                xs = (np.arange(width) * img.shape[1] // width)
                thumb = img[np.ix_(ys, xs)]
                thumbs.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(fn, schema=THUMB_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 2, decoder=fake_decode
) -> DataFrame:
    """Video frame sampling: explode every n-th frame as its own row."""
    if decoder is None:
        raise NotImplementedError("no codec available; pass decoder=")

    def fn(batches):
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                vid = decoder(bytes(payload), "video")
                for idx in range(0, vid.shape[0], every_n):
                    rows["media_id"].append(media_id)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(vid[idx].tobytes())
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(fn, schema=FRAME_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-media fixture table (payload = seeded bytes)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = [["image", "audio", "video"][int(i) % 3] for i in ids]
            payloads = [
                hashlib.sha256(f"{seed}-{int(i)}".encode()).digest() * 4
                for i in ids
            ]
            meta = [
                {
                    "width": 16, "height": 16,
                    "n_frames": 8 if k == "video" else 1,
                    "sample_rate": 16000 if k == "audio" else 0,
                    "codec": "fake",
                }
                for k in kinds
            ]
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": meta}
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
