"""Johansen cointegration kernel — statistical sanity on constructed cases
(the reference has NO cointegration tests, features.R:249-261 is an
untested urca wrapper; these pin our from-scratch implementation)."""

import numpy as np
import pytest

from feasts_spark.kernels.cointegration import cointegration_johansen, johansen


@pytest.fixture(scope="module")
def series():
    rng = np.random.default_rng(5)
    n = 500
    w = np.cumsum(rng.standard_normal(n))
    y1 = w + rng.standard_normal(n) * 0.5
    y2 = 2 * w + rng.standard_normal(n) * 0.5
    a = np.cumsum(rng.standard_normal(n))
    b = np.cumsum(rng.standard_normal(n))
    return y1, y2, a, b


def test_cointegrated_pair_rejects_r0(series):
    y1, y2, *_ = series
    r = johansen(np.column_stack([y1, y2]))
    assert r["eigen_stats"][0] > 20.20  # beyond 1% cval for m-r=2
    assert r["eigen_pvalues"][0] == pytest.approx(0.01)  # clamped (rule=2)
    assert r["eigen_stats"][1] < 7.52  # accept r<=1: exactly one relation
    assert r["eigen_pvalues"][1] == pytest.approx(0.10)


def test_independent_walks_accept_r0(series):
    *_, a, b = series
    r = johansen(np.column_stack([a, b]))
    assert r["eigen_stats"][0] < 9.24  # below 5% cval -> no cointegration


def test_trace_dominates_eigen(series):
    y1, y2, *_ = series
    r = johansen(np.column_stack([y1, y2]))
    # trace(r) = sum of max-eigen terms for i >= r
    np.testing.assert_allclose(
        r["trace_stats"][0],
        r["eigen_stats"][0] + r["eigen_stats"][1],
        rtol=1e-12,
    )
    assert (r["trace_stats"] >= r["eigen_stats"] - 1e-12).all()


def test_wrapper_schema(series):
    y1, y2, *_ = series
    out = cointegration_johansen(y1, y2)
    assert set(out) == {
        "johansen_stat_r0", "johansen_stat_r1",
        "johansen_pvalue_r0", "johansen_pvalue_r1",
        "johansen_trace_r0", "johansen_trace_pvalue_r0",
    }
    assert all(np.isfinite(v) for v in out.values())


def test_short_series_raises():
    with pytest.raises(ValueError):
        johansen(np.random.default_rng(0).standard_normal((6, 2)))
    with pytest.raises(ValueError):
        johansen(np.random.default_rng(0).standard_normal((100, 4)))
