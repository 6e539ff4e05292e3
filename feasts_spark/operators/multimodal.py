"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque BinaryType payloads with a typed metadata struct.
The Spark-side machinery — schemas, partition-friendly batching via
mapInPandas, Arrow-safe binary transport, bounded batch sizes — is real
and tested. Codecs: uncompressed formats that need no external library
are decoded FOR REAL in pure numpy/struct — 24-bit BI_RGB BMP images
(decode_bmp/encode_bmp) and PCM16 mono WAV audio (decode_wav/encode_wav)
— dispatched by magic bytes in `default_decode`. Compressed codecs
(JPEG/MP4/...) are NOT available in this environment (no
PIL/ffmpeg/librosa), so payloads that aren't BMP/WAV fall back to the
deterministic `fake_decode` stand-in (video always does); production
swaps in the real codec via `decoder=`, and `decoder=None` raises
NotImplementedError to make the remaining stub explicit.

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

FEATURE_SCHEMA = (
    "media_id long, kind string, codec string, "
    "feature array<float>, feat_dim int"
)
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


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit BI_RGB BMP from an (H, W, 3) uint8 RGB array — bottom-up
    rows, BGR byte order, rows padded to 4 bytes (the on-disk format)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    size = 54 + body.size
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, body.size, 2835, 2835, 0, 0
    )
    return header + body.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from a 24-bit uncompressed BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={comp}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    body = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=offset)
    rows = body.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 mono RIFF/WAVE from float samples in [-1, 1]."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> np.ndarray:
    """float32 samples in [-1, 1] from a PCM16 mono RIFF/WAVE payload;
    walks the chunk list, so extra chunks (LIST/fact) are skipped."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    data = None
    while pos + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            audio_fmt, channels, _, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("unsupported WAV variant (need PCM16 mono)")
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + csize]
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if data is None:
        raise ValueError("WAV payload has no data chunk")
    return (np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0)


def default_decode(payload: bytes, kind: str) -> np.ndarray:
    """Magic-byte dispatch: real numpy codecs for the uncompressed formats
    (BMP, PCM WAV), the deterministic fake for everything else (JPEG/MP4/
    opaque test payloads — no compressed codec exists in this env). An
    opaque payload that merely STARTS with a magic prefix (e.g. text
    bytes beginning "BM") fails structural validation and falls back to
    the fake rather than raising."""
    return decode_with_codec(payload, kind)[0]


def decode_with_codec(payload: bytes, kind: str) -> tuple:
    """default_decode plus WHICH decode path actually ran:
    (array, codec) with codec in {'real_bmp', 'real_wav', 'fake'} — the
    evidence column that lets a driver row show how much of a corpus hit
    the real numpy codecs vs the deterministic fallback."""
    try:
        if payload[:2] == b"BM":
            return decode_bmp(payload), "real_bmp"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return decode_wav(payload), "real_wav"
    except (ValueError, struct.error):
        pass
    return fake_decode(payload, kind), "fake"


def extract_features(
    df: DataFrame,
    decoder=default_decode,
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Decode + mean-pool feature per media row (map-only mapInPandas).

    Output carries a `codec` column recording which decode path each row
    actually took: `real_bmp`/`real_wav` for the real numpy codecs,
    `fake` for the deterministic fallback, `custom` when a caller-passed
    decoder ran — so downstream evidence (driver rows, corpus audits)
    can report the real-decode fraction rather than assert it."""
    if decoder is None:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "pass decoder=<codec fn> (payload, kind) -> ndarray"
        )
    tagged = (
        decode_with_codec
        if decoder is default_decode
        else (lambda p, k: (decoder(p, k), "custom"))
    )

    def fn(batches):
        for pdf in batches:
            feats, codecs = [], []
            for payload, kind in zip(pdf[payload_col], pdf[kind_col]):
                arr, codec = tagged(bytes(payload), kind)
                arr = arr.astype(np.float64)
                if arr.ndim >= 3:  # image/video: per-channel mean + std
                    flat = arr.reshape(-1, arr.shape[-1])
                    v = np.concatenate([flat.mean(axis=0), flat.std(axis=0)])
                else:  # audio: frame energy profile (8 bins)
                    chunks = np.array_split(arr, 8)
                    v = np.array([float(np.sqrt((c**2).mean())) for c in chunks])
                feats.append(v.astype(np.float32).tolist())
                codecs.append(codec)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf[kind_col],
                    "codec": codecs,
                    "feature": feats,
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def roundtrip_certify(
    df: DataFrame, payload_col: str = "payload", kind_col: str = "kind",
    decode_fn=None,
) -> DataFrame:
    """Per-row encode∘decode round-trip certificate for the REAL codecs
    (map-only, same batching as extract_features).

    Output (media_id, codec, rt_ok). The reference side is always the
    PAYLOAD BYTES, never the decoder's own output — a regression that is
    self-consistent (e.g. a pure scale error that decodes and re-encodes
    through the same wrong factor) cannot self-certify:
      - real_bmp: encode_bmp(decoded array) must equal the payload
        BYTE-EXACTLY — 24-bit BI_RGB is lossless and every payload this
        engine produces uses the canonical layout, so any decode
        regression (row order, BGR/RGB swap, pad handling) breaks the
        byte identity. A decode∘encode∘decode self-consistency fallback
        was deliberately NOT used: encode/decode are inverses for ANY
        array, so a self-consistent regression (channel swap) would
        certify itself. Foreign-layout BMPs (top-down rows, non-54
        offset) report rt_ok=False — certify those corpora with a
        codec-native tool, not this canonical-layout identity;
      - real_wav: the decoded float samples scaled by 32768 must match
        the payload's int16 data chunk (parsed INLINE here, not via
        decode_wav) within one PCM16 LSB, same shape;
      - fake rows certify trivially (no codec claim to check).

    A decoder regression (wrong row order, BGR/RGB swap, scale/offset
    error, dtype/endianness mix-up, chunk mis-walk) flips rt_ok —
    callers turn that into an in-plan raise_error
    (q_multimodal_features does). `decode_fn` overrides the
    (payload, kind) -> (array, codec) decoder — tests inject a broken
    one to pin that the certificate actually trips."""
    decode = decode_fn or decode_with_codec

    def _wav_payload_int16(p: bytes):
        """The payload's raw int16 samples, parsed independently of
        decode_wav (minimal chunk walk, no fmt validation or scaling —
        the parts a decoder regression could corrupt)."""
        if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None
        pos = 12
        while pos + 8 <= len(p):
            cid, csize = struct.unpack_from("<4sI", p, pos)
            if cid == b"data":
                return np.frombuffer(
                    p[pos + 8: pos + 8 + csize], dtype="<i2"
                ).astype(np.float64)
            pos += 8 + csize + (csize & 1)
        return None

    def fn(batches):
        for pdf in batches:
            oks, codecs = [], []
            for payload, kind in zip(pdf[payload_col], pdf[kind_col]):
                p = bytes(payload)
                arr, codec = decode(p, kind)
                if codec == "real_bmp":
                    ok = encode_bmp(arr) == p
                elif codec == "real_wav":
                    pcm = _wav_payload_int16(p)
                    ok = (
                        pcm is not None
                        and arr.shape == pcm.shape
                        and float(
                            np.abs(arr.astype(np.float64) * 32768.0 - pcm)
                            .max()
                        ) <= 1.0
                    )
                else:
                    ok = True
                oks.append(bool(ok))
                codecs.append(codec)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "codec": codecs,
                "rt_ok": oks,
            })

    return df.mapInPandas(fn, schema="media_id long, codec string, rt_ok boolean")


def resize_images(
    df: DataFrame, width: int = 8, height: int = 8, decoder=default_decode
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
    df: DataFrame, every_n: int = 2, decoder=default_decode
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
    """Deterministic media fixture table. Image rows carry REAL 16x16
    24-bit BMP payloads and audio rows REAL 1024-sample PCM16 WAV
    payloads (decoded for real by default_decode); video rows carry an
    opaque seeded payload that exercises the fake-codec fallback (no
    compressed/container codec exists in this environment)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds, payloads, meta = [], [], []
            for i in ids:
                k = ["image", "audio", "video"][int(i) % 3]
                rng = np.random.RandomState((seed * 1_000_003 + int(i)) % (2**32))
                if k == "image":
                    p = encode_bmp(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
                    codec = "bmp24"
                elif k == "audio":
                    p = encode_wav(
                        np.clip(rng.standard_normal(1024) * 0.1, -1, 1), 16000
                    )
                    codec = "pcm16"
                else:
                    p = hashlib.sha256(f"{seed}-{int(i)}".encode()).digest() * 4
                    codec = "fake"
                kinds.append(k)
                payloads.append(p)
                meta.append(
                    {
                        "width": 16, "height": 16,
                        "n_frames": 8 if k == "video" else 1,
                        "sample_rate": 16000 if k == "audio" else 0,
                        "codec": codec,
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": meta}
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
