"""Gorilla time-series compression (Pelkonen et al., VLDB 2015) as Spark UDFs.

Encodes per-(key, chunk) point streams into a BinaryType payload:
  timestamps — delta-of-delta with the paper's bit buckets
               (0 / 7 / 9 / 12 / 32 bits + '0'/'10'/'110'/'1110'/'1111' tags),
  values     — float64 XOR with 5-bit leading-zero + 6-bit block-length
               control, reusing the previous meaningful-bit window when
               possible.

The reference has no compression (feasts holds R vectors in memory); this
is a north-rule engine component [BASELINE.json]. Chunking by (key, tier
bucket span) keeps payloads bounded so executor memory is independent of
conversation length; the encoder is invoked per group via applyInPandas.

Round-trip is bit-exact (tested): decode(encode(ts, vals)) == (ts, vals).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


class _BitWriter:
    __slots__ = ("acc", "nbits")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits

    def to_bytes(self) -> bytes:
        pad = (-self.nbits) % 8
        return ((self.acc << pad)).to_bytes((self.nbits + pad) // 8, "big")


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = int.from_bytes(data, "big")
        self.pos = len(data) * 8

    def read(self, nbits: int) -> int:
        self.pos -= nbits
        return (self.data >> self.pos) & ((1 << nbits) - 1)


_DOD_BUCKETS = (
    (-63, 64, "10", 7),
    (-255, 256, "110", 9),
    (-2047, 2048, "1110", 12),
)


def gorilla_encode(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel int64-microsecond timestamps + float64 values."""
    ts_us = np.asarray(ts_us, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = ts_us.size
    out = _BitWriter()
    out.write(n, 32)
    if n == 0:
        return out.to_bytes()
    out.write(int(ts_us[0]) & ((1 << 64) - 1), 64)
    out.write(struct.unpack(">Q", struct.pack(">d", values[0]))[0], 64)
    prev_delta = 0
    prev_lead, prev_len = -1, -1
    prev_bits = struct.unpack(">Q", struct.pack(">d", values[0]))[0]
    deltas = np.diff(ts_us)
    for i in range(1, n):
        # --- timestamp: delta-of-delta ---
        delta = int(deltas[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            out.write(0, 1)
        else:
            for lo, hi, tag, nbits in _DOD_BUCKETS:
                if lo <= dod <= hi:
                    out.write(int(tag, 2), len(tag))
                    out.write(dod - lo, nbits)
                    break
            else:
                # escape bucket widened to 64 bits (the paper uses 32 for
                # second-resolution stamps; we carry microseconds, where a
                # 1d-tier first-delta alone exceeds 2^31)
                out.write(0b1111, 4)
                out.write(dod & ((1 << 64) - 1), 64)
        # --- value: XOR ---
        bits = struct.unpack(">Q", struct.pack(">d", values[i]))[0]
        xor = bits ^ prev_bits
        prev_bits = bits
        if xor == 0:
            out.write(0, 1)
            continue
        lead = 64 - xor.bit_length()
        trail = (xor & -xor).bit_length() - 1
        if lead > 31:
            lead = 31
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and trail >= 64 - prev_lead - prev_len
        ):
            out.write(0b10, 2)
            out.write(xor >> (64 - prev_lead - prev_len), prev_len)
        else:
            mlen = 64 - lead - trail
            out.write(0b11, 2)
            out.write(lead, 5)
            out.write(mlen - 1, 6)
            out.write(xor >> trail, mlen)
            prev_lead, prev_len = lead, mlen
    return out.to_bytes()


def gorilla_decode(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of gorilla_encode — returns (ts_us int64, values float64)."""
    r = _BitReader(payload)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    bits = r.read(64)
    vals[0] = struct.unpack(">d", struct.pack(">Q", bits))[0]
    prev_delta = 0
    prev_lead, prev_len = -1, -1
    t = t0
    for i in range(1, n):
        # timestamps
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                lo, nbits = -63, 7
            elif r.read(1) == 0:
                lo, nbits = -255, 9
            elif r.read(1) == 0:
                lo, nbits = -2047, 12
            else:
                lo, nbits = None, 64
            raw = r.read(nbits)
            if lo is None:
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
            else:
                dod = raw + lo
        prev_delta += dod
        t += prev_delta
        ts[i] = t
        # values
        if r.read(1) == 0:
            vals[i] = struct.unpack(">d", struct.pack(">Q", bits))[0]
            continue
        if r.read(1) == 0:
            mlen = prev_len
            lead = prev_lead
        else:
            lead = r.read(5)
            mlen = r.read(6) + 1
            prev_lead, prev_len = lead, mlen
        xor = r.read(mlen) << (64 - lead - mlen)
        bits ^= xor
        vals[i] = struct.unpack(">d", struct.pack(">Q", bits))[0]
    return ts, vals


CHUNK_SCHEMA = (
    "series_key string, tier string, start_ts timestamp, end_ts timestamp, "
    "n_points int, payload binary"
)


def compress_chunks(
    df: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> DataFrame:
    """Rollup rows -> one Gorilla chunk per key (per tier).

    At scale chunks should additionally split on a bounded span (e.g. one
    day of 1m points) — callers pre-split by adding the span column to the
    group key; this operator compresses whatever group it is given.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts_us = pdf[ts_col].astype("int64").to_numpy()  # ns since epoch
        ts_us = ts_us // 1000
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        payload = gorilla_encode(ts_us, vals)
        return pd.DataFrame(
            [{
                "series_key": str(pdf[key_col].iloc[0]),
                "tier": tier,
                "start_ts": pdf[ts_col].iloc[0],
                "end_ts": pdf[ts_col].iloc[-1],
                "n_points": len(pdf),
                "payload": payload,
            }]
        )

    return df.groupBy(key_col).applyInPandas(fn, schema=CHUNK_SCHEMA)


def decompress_chunks(chunks: DataFrame) -> DataFrame:
    """Chunk table -> exploded (series_key, tier, bucket_ts, value) rows."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, row in pdf.iterrows():
            ts_us, vals = gorilla_decode(bytes(row["payload"]))
            frames.append(
                pd.DataFrame({
                    "series_key": row["series_key"],
                    "tier": row["tier"],
                    "bucket_ts": pd.to_datetime(ts_us * 1000),
                    "value": vals,
                })
            )
        if not frames:
            return pd.DataFrame(
                columns=["series_key", "tier", "bucket_ts", "value"]
            )
        return pd.concat(frames, ignore_index=True)

    return chunks.groupBy("series_key").applyInPandas(
        fn, schema="series_key string, tier string, bucket_ts timestamp, value double"
    )
