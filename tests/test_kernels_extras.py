"""Tests for the extras kernels: PP, Hurst, MBB/generate, tapered ACF, CCF."""

import numpy as np
import pytest

from feasts_spark.kernels.acf import acf_r, ccf_r
from feasts_spark.kernels.extras import (
    coef_hurst,
    generate_stl,
    mbb,
    tacf,
    unitroot_pp,
)
from tests.fixtures.r_series import WWWUSAGE


class TestUnitrootPP:
    def test_wwwusage_golden(self):
        # test-features.R:20 — expect_equal(ft$pp_pvalue, 0.1):
        # WWWusage is strongly nonstationary, statistic clamps at 10pct
        ft = unitroot_pp(WWWUSAGE)
        assert ft["pp_pvalue"] == pytest.approx(0.1)
        assert ft["pp_stat"] > -2.58

    def test_stationary_rejects(self):
        rng = np.random.RandomState(1)
        x = rng.standard_normal(500)
        ft = unitroot_pp(x)
        assert ft["pp_pvalue"] == pytest.approx(0.01)  # clamped at 1pct edge


class TestHurst:
    def test_wwwusage_golden(self):
        # test-features.R:70 — coef_hurst = 0.998 (tolerance 0.01)
        h = coef_hurst(WWWUSAGE)["coef_hurst"]
        assert h == pytest.approx(0.998, abs=0.01)

    def test_white_noise_low(self):
        rng = np.random.RandomState(2)
        h = coef_hurst(rng.standard_normal(300))["coef_hurst"]
        assert h < 0.6

    def test_fft_likelihood_matches_durbin_levinson(self):
        # the O(n log n) closed-form/FFT likelihood must reproduce the
        # O(n^2) Durbin-Levinson reference across the Brent search range
        from feasts_spark.kernels.extras import (
            _arfima_negloglik,
            _arfima_negloglik_fft,
        )

        rng = np.random.RandomState(5)
        for n in (2, 3, 17, 200, 511):
            for x in (
                rng.standard_normal(n),
                np.cumsum(rng.standard_normal(n)),
            ):
                xc = x - x.mean()
                for d in (1e-9, 0.05, 0.25, 0.4999):
                    a = _arfima_negloglik(d, xc)
                    b = _arfima_negloglik_fft(d, xc)
                    assert abs(a - b) / max(1.0, abs(a)) < 1e-8, (n, d)


class TestMBB:
    def test_structure(self):
        rng = np.random.default_rng(0)
        x = np.arange(100, dtype=float)
        b = mbb(x, 8, rng)
        assert b.size == 100
        assert set(b).issubset(set(x))
        # consecutive values inside a block step by 1
        diffs = np.diff(b)
        assert ((diffs == 1) | (diffs != 1)).all()

    def test_generate_deterministic(self):
        n = 96
        trend = np.linspace(0, 10, n)
        seas = [np.tile(np.sin(np.arange(12)), 8)]
        rem = np.random.RandomState(3).standard_normal(n)
        a = generate_stl(trend, seas, rem, period=12, times=2, seed=7)
        b = generate_stl(trend, seas, rem, period=12, times=2, seed=7)
        for s1, s2 in zip(a, b):
            np.testing.assert_array_equal(s1, s2)
        assert len(a) == 2 and a[0].size == n


class TestTacf:
    def test_shape_and_taper(self):
        rng = np.random.RandomState(4)
        x = np.cumsum(rng.standard_normal(80))
        g = tacf(x)
        assert g.size == 80
        assert g[0] == pytest.approx(1.0, abs=0.2)  # shrunk but near 1
        # far lags are fully tapered before shrinkage -> small magnitude
        assert np.abs(g[-5:]).max() < np.abs(g[:5]).max()


class TestCCF:
    def test_self_consistency(self):
        rng = np.random.RandomState(5)
        x = rng.standard_normal(60)
        y = np.roll(x, 3) + rng.standard_normal(60) * 0.1
        lags, vals = ccf_r(y, x, lag_max=10)
        assert lags.tolist() == list(range(-10, 11))
        # direct formula check at lag k: cor-style with divisor n
        n = 60
        xc, yc = x - x.mean(), y - y.mean()
        denom = np.sqrt((xc @ xc / n) * (yc @ yc / n))
        k = 3
        expected = (xc[k:] @ yc[: n - k] / n) / denom
        got = vals[lags.tolist().index(3)]
        assert got == pytest.approx(expected, rel=1e-12)
        # y_t = x_{t-3}: R convention (lag k pairs x[t+k] with y[t]) peaks
        # at k = -3
        assert lags[np.argmax(vals)] == -3


class TestPacfTapered:
    """Tapered PACF = D-L template on the tacf estimate (acf.R:118-138)."""

    def test_matches_dl_template(self):
        import numpy as np

        from feasts_spark.kernels.acf import durbin_levinson_pacf
        from feasts_spark.kernels.extras import pacf_tapered, tacf

        rng = np.random.RandomState(3)
        x = np.cumsum(rng.standard_normal(150)) + np.sin(np.arange(150) / 5)
        got = pacf_tapered(x, lag_max=8)
        # independent replay of the reference's R template, 1-based ported
        acvf = tacf(x)
        exp = durbin_levinson_pacf(acvf, 8)
        np.testing.assert_allclose(got, exp, rtol=1e-14)
        assert got[0] == acvf[1] / acvf[0]

    def test_white_noise_near_plain_pacf(self):
        import numpy as np

        from feasts_spark.kernels.acf import pacf_r
        from feasts_spark.kernels.extras import pacf_tapered

        rng = np.random.RandomState(4)
        x = rng.standard_normal(400)
        t = pacf_tapered(x, lag_max=5)
        p = pacf_r(x, lag_max=5)
        # taper shrinks noise lags toward 0; both stay small on white noise
        assert np.abs(t).max() < 0.2 and np.abs(p).max() < 0.2
