"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY.md §5); these guard OUR
engine-side inventions — bit-level codecs and window algebra — where
random inputs catch cases golden series can't.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from feasts_spark.kernels.acf import acf_r, durbin_levinson_pacf
from feasts_spark.kernels.rmath import rle
from feasts_spark.operators.compression import gorilla_decode, gorilla_encode

finite = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e12, max_value=1e12,
)


class TestGorilla:
    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 2**48), finite), min_size=1, max_size=300
        )
    )
    def test_roundtrip_bitwise(self, pts):
        # timestamps must be sorted (chunker sorts by ts)
        ts = np.sort(np.array([p[0] for p in pts], dtype=np.int64))
        vals = np.array([p[1] for p in pts])
        out_ts, out_vals = gorilla_decode(gorilla_encode(ts, vals))
        np.testing.assert_array_equal(out_ts, ts)
        # bitwise: compare raw float bits, not approx
        np.testing.assert_array_equal(
            out_vals.view(np.int64), vals.view(np.int64)
        )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(finite, min_size=1, max_size=200))
    def test_special_values(self, vals):
        # inject signed zeros / repeated values — XOR path edge cases
        v = np.array(vals)
        v[::3] = -0.0
        if v.size > 1:
            v[1::2] = v[0]
        ts = np.arange(v.size, dtype=np.int64) * 60_000_000
        out_ts, out_vals = gorilla_decode(gorilla_encode(ts, v))
        np.testing.assert_array_equal(out_vals.view(np.int64), v.view(np.int64))

    def test_regular_grid_compresses(self):
        # delta-of-delta on a regular grid + slowly varying values beats raw
        ts = np.arange(10_000, dtype=np.int64) * 60_000_000
        vals = np.round(np.sin(np.arange(10_000) / 50.0), 3) + 100.0
        payload = gorilla_encode(ts, vals)
        assert len(payload) < 0.5 * (16 * ts.size)
        # constant values + regular grid -> ~1 bit/point each stream
        flat = gorilla_encode(ts, np.full(ts.size, 42.0))
        assert len(flat) < 0.03 * (16 * ts.size)


class TestAcfProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(finite, min_size=5, max_size=200))
    def test_acf_bounds_and_lag0(self, vals):
        x = np.array(vals)
        if np.allclose(x, x[0]):
            return  # constant series -> 0/0, NaN by R semantics
        acf = acf_r(x, lag_max=min(10, x.size - 1), na_action="pass")
        assert acf[0] == 1.0
        ok = acf[~np.isnan(acf)]
        assert (np.abs(ok) <= 1.0 + 1e-9).all()

    @settings(max_examples=100, deadline=None)
    @given(st.lists(finite, min_size=8, max_size=200))
    def test_pacf_from_acf_bounded(self, vals):
        x = np.array(vals)
        if np.allclose(x, x[0]):
            return
        acf = acf_r(x, lag_max=min(8, x.size - 1), na_action="pass")
        if np.isnan(acf).any():
            return
        pacf = durbin_levinson_pacf(acf, acf.size - 1)
        assert (np.abs(pacf[~np.isnan(pacf)]) <= 1.0 + 1e-6).all()


class TestRle:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(0, 3), min_size=1, max_size=200))
    def test_rle_reconstructs(self, vals):
        x = np.array(vals, dtype=np.float64)
        lengths, values = rle(x)
        rebuilt = np.repeat(values, lengths)
        np.testing.assert_array_equal(rebuilt, x)
        # maximality: no two adjacent runs share a value
        assert (np.diff(values) != 0).all()


class TestArfimaFFT:
    """The O(n log n) FFT ARFIMA likelihood vs the O(n^2) Durbin-Levinson
    reference on arbitrary series — guards the closed-form gamma-ratio
    factorization across the whole Brent search range."""

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(finite, min_size=2, max_size=120),
        st.floats(min_value=1e-6, max_value=0.499999),
    )
    def test_fft_matches_dl(self, vals, d):
        from feasts_spark.kernels.extras import (
            _arfima_negloglik,
            _arfima_negloglik_fft,
        )

        x = np.array(vals)
        x = x - x.mean()
        if not np.any(np.abs(x) > 1e-12):
            return  # constant series: ssr=0 -> -inf in both, skip
        a = _arfima_negloglik(d, x)
        b = _arfima_negloglik_fft(d, x)
        assert abs(a - b) / max(1.0, abs(a)) < 1e-7


class TestMediaCodecs:
    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31 - 1))
    def test_bmp_roundtrip(self, h, w, seed):
        from feasts_spark.operators.multimodal import decode_bmp, encode_bmp

        img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(
            np.uint8
        )
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.floats(
                allow_nan=False, allow_infinity=False,
                min_value=-1.0, max_value=1.0, width=32,
            ),
            min_size=1, max_size=400,
        )
    )
    def test_wav_roundtrip(self, vals):
        from feasts_spark.operators.multimodal import decode_wav, encode_wav

        s = np.array(vals, dtype=np.float32)
        dec = decode_wav(encode_wav(s))
        assert dec.shape == s.shape
        assert float(np.max(np.abs(dec - s))) < 1.0 / 16384
