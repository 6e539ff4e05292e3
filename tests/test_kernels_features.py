"""Golden-value kernel tests transcribed from the reference testthat suite.

Reference: /root/reference/tests/testthat/test-features.R (tolerance 0.01,
guerrero 0.001) and test-stl.R. Same numbers, same series.
"""

import numpy as np
import pytest

from feasts_spark.kernels import (
    box_pierce,
    estimate_stl,
    feat_acf,
    feat_intermittent,
    feat_pacf,
    feat_spectral,
    feat_stl,
    guerrero,
    ljung_box,
    longest_flat_spot,
    n_crossing_points,
    shift_kl_max,
    shift_level_max,
    shift_var_max,
    stat_arch_lm,
    supsmu,
    var_tiled_mean,
    var_tiled_var,
)
from tests.fixtures.r_series import FDEATHS, MDEATHS, SYNTHETIC_MS, WWWUSAGE


def approx(val, expected, tol=0.01):
    assert val == pytest.approx(expected, abs=tol * max(1.0, abs(expected))), (
        f"got {val}, want {expected}"
    )


class TestGuerrero:
    # test-features.R:7-15
    def test_wwwusage(self):
        approx(guerrero(WWWUSAGE)["lambda_guerrero"], 0.360, tol=0.001 / 0.36)

    # test-features.R:12-14: lung_deaths_long keys sort alphabetically, so
    # the expected c(-0.9, 0.321) maps to (fdeaths, mdeaths).
    def test_mdeaths(self):
        approx(guerrero(MDEATHS, period=12)["lambda_guerrero"], 0.321, tol=0.001 / 0.321)

    def test_fdeaths(self):
        approx(guerrero(FDEATHS, period=12)["lambda_guerrero"], -0.9, tol=0.001)


class TestBasicFeatures:
    # test-features.R:26-35
    def test_crossing_points(self):
        assert n_crossing_points(WWWUSAGE)["n_crossing_points"] == 7

    def test_longest_flat_spot(self):
        assert longest_flat_spot(WWWUSAGE)["longest_flat_spot"] == 13

    def test_spectral_entropy(self):
        approx(feat_spectral(WWWUSAGE)["spectral_entropy"], 0.461)

    def test_var_tiled_var(self):
        approx(var_tiled_var(WWWUSAGE)["var_tiled_var"], 0.0139)

    def test_var_tiled_mean(self):
        approx(var_tiled_mean(WWWUSAGE)["var_tiled_mean"], 0.988)


class TestCfFeatures:
    # test-features.R:38-49
    def test_feat_acf(self):
        ft = feat_acf(WWWUSAGE)
        approx(ft["acf1"], 0.960)
        approx(ft["acf10"], 4.19)
        approx(ft["diff1_acf1"], 0.792)
        approx(ft["diff1_acf10"], 1.41)
        approx(ft["diff2_acf1"], 0.174)
        approx(ft["diff2_acf10"], 0.334)

    def test_feat_pacf(self):
        ft = feat_pacf(WWWUSAGE)
        approx(ft["pacf5"], 1.04)
        approx(ft["diff1_pacf5"], 0.802)
        approx(ft["diff2_pacf5"], 0.222)


class TestShiftFeatures:
    # test-features.R:52-62
    def test_shift_level(self):
        ft = shift_level_max(WWWUSAGE)
        approx(ft["shift_level_max"], 71.7)
        assert ft["shift_level_index"] == 84

    def test_shift_var(self):
        ft = shift_var_max(WWWUSAGE)
        approx(ft["shift_var_max"], 749)
        assert ft["shift_var_index"] == 54

    def test_shift_kl(self):
        ft = shift_kl_max(WWWUSAGE)
        approx(ft["shift_kl_max"], 1.44)
        assert ft["shift_kl_index"] == 57


class TestModelFeatures:
    # test-features.R:64-86
    def test_stat_arch_lm(self):
        approx(stat_arch_lm(WWWUSAGE)["stat_arch_lm"], 0.990)

    def test_feat_stl_wwwusage(self):
        ft = feat_stl(WWWUSAGE, period=1)
        approx(ft["trend_strength"], 0.985)
        approx(ft["spikiness"], 0.0772)
        approx(ft["linearity"], 178, tol=0.01)
        approx(ft["curvature"], 44, tol=0.01)
        approx(ft["stl_e_acf1"], 0.774)
        approx(ft["stl_e_acf10"], 0.983)

    def test_feat_stl_fdeaths(self):
        ft = feat_stl(FDEATHS, period=12, period_name="year")
        approx(ft["trend_strength"], 0.1191)
        approx(ft["seasonal_strength_year"], 0.8832)
        assert ft["seasonal_peak_year"] == 2
        assert ft["seasonal_trough_year"] == 8
        approx(ft["spikiness"], 23968.457)
        approx(ft["linearity"], -147.5444)
        approx(ft["curvature"], 13.0048)
        approx(ft["stl_e_acf1"], 0.024, tol=0.01)
        approx(ft["stl_e_acf10"], 0.194)


class TestMultiSeasonalStl:
    # test-stl.R:47-80 — structural expectations on a synthetic series.
    # R expect_equal(tolerance=0.01) compares MEAN (relative) difference,
    # reproduced here as r_all_equal.
    @staticmethod
    def r_all_equal(current, target, tol=0.01):
        target = np.asarray(target, dtype=float)
        current = np.asarray(current, dtype=float)
        diff = np.mean(np.abs(target - current))
        scale = np.mean(np.abs(target))
        if scale > 0:
            diff = diff / scale
        assert diff < tol, f"mean diff {diff} >= {tol}"

    def test_components(self):
        dcmp = estimate_stl(SYNTHETIC_MS, periods=[4, 7], period_names=["4", "7"])
        self.r_all_equal(dcmp["trend"], np.full(100, 6.5))
        self.r_all_equal(dcmp["remainder"], np.zeros(100))
        self.r_all_equal(dcmp["season_4"], np.tile(np.arange(1, 5), 25)[:100] - 2.5)
        self.r_all_equal(dcmp["season_7"], np.resize(np.arange(1, 8), 100) - 4.0)
        np.testing.assert_allclose(
            SYNTHETIC_MS - dcmp["season_4"] - dcmp["season_7"],
            dcmp["season_adjust"],
            atol=1e-9,
        )
        np.testing.assert_allclose(
            dcmp["season_adjust"], dcmp["trend"] + dcmp["remainder"], atol=1e-9
        )


class TestFeatStlValidation:
    def test_duplicate_periods_raise(self):
        from feasts_spark.kernels.feat_stl import feat_stl

        with pytest.raises(ValueError, match="duplicate seasonal periods"):
            feat_stl(SYNTHETIC_MS, period=(7, 7))

    def test_distinct_periods_named_correctly(self):
        from feasts_spark.kernels.feat_stl import feat_stl

        out = feat_stl(SYNTHETIC_MS, period=(4, 7))
        # peak/trough computed modulo each season's OWN period
        assert 0 <= out["seasonal_peak_4"] < 4
        assert 0 <= out["seasonal_peak_7"] < 7
        assert 0 <= out["seasonal_trough_4"] < 4
        assert 0 <= out["seasonal_trough_7"] < 7


class TestNonSeasonalStl:
    # test-stl.R:27-44 — non-seasonal STL trend equals supsmu
    def test_supsmu_fallback(self):
        dcmp = estimate_stl(WWWUSAGE, periods=[])
        sm = supsmu(np.arange(1, 101, dtype=float), WWWUSAGE)
        np.testing.assert_allclose(dcmp["trend"], sm, atol=1e-12)
        np.testing.assert_allclose(dcmp["remainder"], WWWUSAGE - sm, atol=1e-12)
        np.testing.assert_allclose(dcmp["season_adjust"], WWWUSAGE, atol=1e-12)


class TestPortmanteau:
    # analytic sanity: known chi-square values + structure
    def test_ljung_box_structure(self):
        rng = np.random.RandomState(42)
        x = rng.standard_normal(100)
        lb = ljung_box(x, lag=1)
        bp = box_pierce(x, lag=1)
        n = 100
        from feasts_spark.kernels.acf import acf_r

        r1 = acf_r(x, lag_max=1)[1]
        assert lb["lb_stat"] == pytest.approx(n * (n + 2) * r1**2 / (n - 1))
        assert bp["bp_stat"] == pytest.approx(n * r1**2)
        assert 0.0 <= lb["lb_pvalue"] <= 1.0

    def test_chi2_known_values(self):
        from feasts_spark.kernels.rmath import chi2_sf

        # 1 - pchisq(3.841459, 1) = 0.05; 1 - pchisq(5.991465, 2) = 0.05
        assert chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, abs=1e-9)
        assert chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, abs=1e-9)
        assert chi2_sf(18.307038053275146, 10) == pytest.approx(0.05, abs=1e-9)


class TestIntermittent:
    def test_basic(self):
        x = np.array([0, 0, 1, 0, 2, 0, 0, 0, 3, 0], dtype=float)
        ft = feat_intermittent(x)
        # zero runs: 2, 1, 3, 1 -> mean 1.75
        assert ft["zero_run_mean"] == pytest.approx(1.75)
        assert ft["zero_start_prop"] == pytest.approx(0.2)
        assert ft["zero_end_prop"] == pytest.approx(0.1)
        nz = np.array([1.0, 2.0, 3.0])
        assert ft["nonzero_squared_cv"] == pytest.approx((nz.std(ddof=1) / nz.mean()) ** 2)

    def test_no_zeros(self):
        ft = feat_intermittent(np.array([1.0, 2.0, 3.0]))
        assert ft["zero_run_mean"] == 0.0
        assert ft["zero_start_prop"] == 0.0
        assert ft["zero_end_prop"] == 0.0
