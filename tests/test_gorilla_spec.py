"""Byte-format spec for the vectorized Gorilla codec.

`_spec_encode` below is the round-1 scalar bit-writer implementation,
kept verbatim as the executable specification of the wire format
(Pelkonen et al. VLDB 2015 layout; escape bucket widened to 64 bits for
microsecond stamps). The vectorized encoder in
feasts_spark.operators.compression must produce byte-identical payloads.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from feasts_spark.operators.compression import gorilla_decode, gorilla_encode


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
        return (self.acc << pad).to_bytes((self.nbits + pad) // 8, "big")


_DOD_BUCKETS = (
    (-63, 64, "10", 7),
    (-255, 256, "110", 9),
    (-2047, 2048, "1110", 12),
)


def _spec_encode(ts_us: np.ndarray, values: np.ndarray) -> bytes:
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
                out.write(0b1111, 4)
                out.write(dod & ((1 << 64) - 1), 64)
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
        if prev_lead >= 0 and lead >= prev_lead and trail >= 64 - prev_lead - prev_len:
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


def _cases():
    rng = np.random.RandomState(17)
    # random irregular stamps, noisy values
    ts1 = np.cumsum(rng.randint(1, 2_000_000, 800)).astype(np.int64)
    v1 = rng.standard_normal(800) * 1e7
    v1[::5] = v1[::5].round(2)
    # regular grid, repeated + decimal values (heavy xor==0 / reuse paths)
    ts2 = np.arange(1000, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
    v2 = np.repeat(np.round(rng.standard_normal(250), 1), 4)
    # huge dod jumps (escape bucket), negative first stamp
    ts3 = np.array([-5_000_000, 0, 10**13, 10**13 + 1, 2 * 10**13], np.int64)
    v3 = np.array([0.0, -0.0, np.inf, -1.5e-300, 1.0])
    # tiny series
    ts4 = np.array([42], np.int64)
    v4 = np.array([3.14])
    ts5 = np.empty(0, np.int64)
    v5 = np.empty(0, np.float64)
    # integral slow ramp (long reuse windows)
    ts6 = np.cumsum(rng.randint(59, 62, 600)).astype(np.int64) * 1_000_000
    v6 = np.floor(np.arange(600) / 37.0) * 8.0
    return [(ts1, v1), (ts2, v2), (ts3, v3), (ts4, v4), (ts5, v5), (ts6, v6)]


@pytest.mark.parametrize("idx", range(6))
def test_vectorized_matches_spec_bytes(idx):
    ts, vals = _cases()[idx]
    assert gorilla_encode(ts, vals) == _spec_encode(ts, vals)


@pytest.mark.parametrize("idx", range(6))
def test_roundtrip_bitwise(idx):
    ts, vals = _cases()[idx]
    ts2, v2 = gorilla_decode(gorilla_encode(ts, vals))
    np.testing.assert_array_equal(ts, ts2)
    assert np.array_equal(
        np.asarray(vals, np.float64).view(np.uint64), v2.view(np.uint64)
    )


# hypothesis: random series must stay byte-identical to the spec encoder
try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=300),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        grid=st.booleans(),
        decimals=st.integers(min_value=0, max_value=3),
    )
    def test_vectorized_matches_spec_random(n, seed, grid, decimals):
        rng = np.random.RandomState(seed)
        if grid:
            ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
        else:
            ts = np.cumsum(rng.randint(1, 10**7, n)).astype(np.int64)
        vals = np.round(rng.standard_normal(n) * 10.0**rng.randint(0, 6), decimals)
        if n and rng.rand() < 0.5:
            vals[:: max(1, n // 5)] = vals[0]  # repeated values
        assert gorilla_encode(ts, vals) == _spec_encode(ts, vals)
        ts2, v2 = gorilla_decode(gorilla_encode(ts, vals))
        np.testing.assert_array_equal(ts, ts2)
        assert np.array_equal(vals.view(np.uint64), v2.view(np.uint64))
except ImportError:  # pragma: no cover
    pass


# --- tag-index sidecar (round 4): payload byte-identical, index spec, ---
# --- vectorized decode == sequential decode -----------------------------

def test_indexed_sidecar_spec_and_equivalence():
    from feasts_spark.operators.compression import (
        gorilla_decode_indexed,
        gorilla_encode_indexed,
    )

    for ts, vals in _cases():
        payload, idx = gorilla_encode_indexed(ts, vals)
        # payload byte format unchanged by the sidecar
        assert payload == gorilla_encode(ts, vals)
        # sidecar spec: version byte + one uint8 entry-length per point
        # 1..n-1, and the lengths account for every bit past the header
        assert idx[0] == 1
        n = len(ts)
        assert len(idx) == 1 + max(n - 1, 0)
        if n >= 2:
            header_bits = 160
            body_bits = int(np.frombuffer(idx, np.uint8, offset=1)
                            .astype(np.int64).sum())
            total = header_bits + body_bits
            assert (total + 7) // 8 == len(payload)
        ts2, v2 = gorilla_decode_indexed(payload, idx)
        np.testing.assert_array_equal(ts, ts2)
        assert np.array_equal(
            np.asarray(vals, np.float64).view(np.uint64), v2.view(np.uint64)
        )
        # missing / foreign-version sidecar falls back to the scan path
        ts3, v3 = gorilla_decode_indexed(payload, None)
        np.testing.assert_array_equal(ts, ts3)
        ts4, _ = gorilla_decode_indexed(payload, b"\x7f" + idx[1:])
        np.testing.assert_array_equal(ts, ts4)


try:
    from hypothesis import given as _given, settings as _settings
    from hypothesis import strategies as _st

    @_settings(max_examples=40, deadline=None)
    @_given(
        n=_st.integers(min_value=0, max_value=300),
        seed=_st.integers(min_value=0, max_value=2**31 - 1),
        grid=_st.booleans(),
        decimals=_st.integers(min_value=0, max_value=3),
    )
    def test_indexed_decode_matches_sequential_random(n, seed, grid, decimals):
        from feasts_spark.operators.compression import (
            gorilla_decode_indexed,
            gorilla_encode_indexed,
        )

        rng = np.random.RandomState(seed)
        if grid:
            ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
        else:
            ts = np.cumsum(rng.randint(1, 10**7, n)).astype(np.int64)
        vals = np.round(rng.standard_normal(n) * 10.0**rng.randint(0, 6), decimals)
        if n and rng.rand() < 0.5:
            vals[:: max(1, n // 5)] = vals[0]
        payload, idx = gorilla_encode_indexed(ts, vals)
        a_ts, a_v = gorilla_decode_indexed(payload, idx)
        b_ts, b_v = gorilla_decode(payload)
        np.testing.assert_array_equal(a_ts, b_ts)
        assert np.array_equal(a_v.view(np.uint64), b_v.view(np.uint64))
        np.testing.assert_array_equal(a_ts, ts)
except ImportError:  # pragma: no cover
    pass
