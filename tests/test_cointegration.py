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


class TestPhillipsOuliaris:
    """Pu/Pz variance-ratio tests (features.R:268-335 wraps urca::ca.po);
    critical values are seeded Monte Carlo quantiles of this exact
    statistic (tools/gen_po_tables.py)."""

    def test_cointegrated_pair_rejects(self, series=None):
        from feasts_spark.kernels.cointegration import phillips_ouliaris

        rng = np.random.default_rng(11)
        w = np.cumsum(rng.standard_normal(600))
        z = np.column_stack([w + 0.2 * rng.standard_normal(600), w])
        for typ in ("Pu", "Pz"):
            r = phillips_ouliaris(z, type=typ)
            assert r["phillips_ouliaris_pvalue"] == pytest.approx(0.01)

    def test_independent_walks_accept(self):
        from feasts_spark.kernels.cointegration import phillips_ouliaris

        rng = np.random.default_rng(12)
        rej = 0
        for _ in range(20):
            z = np.cumsum(rng.standard_normal((600, 2)), axis=0)
            r = phillips_ouliaris(z)
            rej += r["phillips_ouliaris_pvalue"] <= 0.05
        assert rej <= 4  # ~5% nominal size, generous MC slack

    def test_mc_table_consistency(self):
        # re-simulate a small null sample and check the 5% cval sits near
        # the empirical 95th percentile (table provenance check)
        from feasts_spark.kernels.cointegration import _PO_CVAL, _po_stats

        rng = np.random.RandomState(99)
        stats = [
            _po_stats(np.cumsum(rng.standard_normal((500, 2)), axis=0))["Pu"]
            for _ in range(400)
        ]
        emp95 = np.quantile(stats, 0.95)
        assert abs(emp95 - _PO_CVAL[("Pu", "none")][1][1]) < 6.0

    def test_demean_variants_and_errors(self):
        from feasts_spark.kernels.cointegration import phillips_ouliaris

        rng = np.random.default_rng(13)
        z = np.cumsum(rng.standard_normal((300, 3)), axis=0)
        for dm in ("none", "constant"):
            r = phillips_ouliaris(z, demean=dm)
            assert np.isfinite(r["phillips_ouliaris_stat"])
        with pytest.raises(ValueError):
            phillips_ouliaris(z, demean="trend")  # no MC table for trend
