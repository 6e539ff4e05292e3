"""Tests for the gg_season / gg_subseries / gg_lag data-prep operators."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.seasonal import (
    arma_roots_data,
    gg_lag_data,
    gg_season_data,
    gg_tsdisplay_data,
    gg_tsresiduals_data,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _hourly(spark, n_hours, key="k1", base=0.0):
    rows = [
        (key, T0 + dt.timedelta(hours=h), base + float(h)) for h in range(n_hours)
    ]
    return spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, val_avg double"
    )


# ---------------------------------------------------------- gg_season ----

def test_gg_season_cycle_and_pos(spark):
    # 3 full days of hourly points: cycle = the day, pos = 3600*hour
    out = gg_season_data(_hourly(spark, 72), period="1d").orderBy("cycle", "pos")
    rows = out.collect()
    assert len(rows) == 72
    for r in rows:
        h = int((r.val) % 24)
        assert r.pos == 3600 * h
        assert r.cycle.hour == 0 and r.cycle.minute == 0
    # value h of day d is 24*d + h -> season_mean at hour h over 3 days
    by_pos = {}
    for r in rows:
        by_pos.setdefault(r.pos, []).append((r.val, r.season_mean))
    for pos, vs in by_pos.items():
        expected = np.mean([v for v, _ in vs])
        for _, m in vs:
            assert m == pytest.approx(expected)


def test_gg_season_pure_projection_without_mean(spark):
    out = gg_season_data(_hourly(spark, 24), period="1d", with_season_mean=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan-speed path: zero shuffles
    assert "season_mean" not in out.columns


def test_gg_season_weekly_period(spark):
    out = gg_season_data(_hourly(spark, 24 * 14), period="1w")
    # two cycles (weeks), pos spans 0 .. 7*86400-3600
    cycles = sorted(r.cycle for r in out.select("cycle").distinct().collect())
    assert len(cycles) == 2
    pmax = out.agg(F.max("pos")).first()[0]
    assert pmax == 7 * 86400 - 3600


def test_gg_season_bad_period(spark):
    with pytest.raises(ValueError):
        gg_season_data(_hourly(spark, 4), period="fortnight")


# ------------------------------------------------------------- gg_lag ----

def test_gg_lag_pairs_match_numpy(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=30)
    rows = [("k", T0 + dt.timedelta(hours=h), float(v)) for h, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, val_avg double"
    )
    out = gg_lag_data(df, lags=(1, 3)).orderBy("lag", "rn").collect()
    expected = []
    for k in (1, 3):
        for t in range(k, 30):
            expected.append((k, t + 1, vals[t], vals[t - k]))
    assert len(out) == len(expected)
    for r, (k, rn, v, vl) in zip(out, expected):
        assert (r.lag, r.rn) == (k, rn)
        assert r.val == pytest.approx(v)
        assert r.val_lag == pytest.approx(vl)


def test_gg_lag_multi_key_isolation(spark):
    df = _hourly(spark, 5).union(_hourly(spark, 5, key="k2", base=100.0))
    out = gg_lag_data(df, lags=(1,))
    # no pair crosses series: val - val_lag == 1 within each key
    bad = out.filter(F.abs(F.col("val") - F.col("val_lag")) != 1.0).count()
    assert bad == 0
    assert out.count() == 8  # 4 pairs per key


def test_gg_lag_single_window_node(spark):
    # Catalyst must fuse all per-lag expressions into ONE Window sort
    out = gg_lag_data(_hourly(spark, 10), lags=(1, 2, 3, 4))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 2  # one Window node (+rn) in one pass
    assert plan.count("Exchange") == 1  # single shuffle on the series key


def test_gg_lag_validation(spark):
    df = _hourly(spark, 3)
    with pytest.raises(ValueError):
        gg_lag_data(df, lags=())
    with pytest.raises(ValueError):
        gg_lag_data(df, lags=(0, 1))


# -------------------------------------------------------- gg_tsdisplay ----

def test_gg_tsdisplay_panel_frames(spark):
    df = _hourly(spark, 72)
    panel = gg_tsdisplay_data(df, period="1d", lag_max=5)
    assert set(panel) == {"series", "acf", "season"}
    assert panel["series"].count() == 72
    assert panel["series"].columns == ["series_key", "ts", "val"]
    acf = panel["acf"].orderBy("lag").collect()
    assert [r.lag for r in acf] == [1, 2, 3, 4, 5]
    # linear ramp: acf(k) for the demeaned ramp matches numpy
    vals = np.arange(72, dtype=float)
    d = vals - vals.mean()
    assert acf[0].acf == pytest.approx(np.dot(d[1:], d[:-1]) / np.dot(d, d))
    season = panel["season"]
    assert season.count() == 72 and "season_mean" not in season.columns


def test_gg_tsresiduals_panel(spark):
    rng = np.random.default_rng(11)
    rows = [
        ("k", T0 + dt.timedelta(hours=h), float(v))
        for h, v in enumerate(rng.normal(size=48))
    ]
    comps = spark.createDataFrame(
        rows, "series_key string, bucket_ts timestamp, remainder double"
    )
    panel = gg_tsresiduals_data(comps, lag_max=3)
    assert set(panel) == {"residuals", "acf", "hist"}
    assert panel["residuals"].count() == 48
    assert panel["acf"].count() == 3
    hist = panel["hist"].collect()
    # histogram counts partition the rows and bins are 0.1-rounded residuals
    assert sum(r.n for r in hist) == 48
    expected_bins = {round(float(r[2]), 1) for r in rows}
    assert {float(r.bin) for r in hist} == expected_bins


# ------------------------------------------------------------ gg_arma ----

def test_arma_roots_ar1_ma1(spark):
    out = {
        (r.kind, r.root_idx): r
        for r in arma_roots_data(spark, ar=(0.5,), ma=(0.8,)).collect()
    }
    ar = out[("AR", 0)]
    assert (ar.re, ar.im, ar.modulus) == pytest.approx((0.5, 0.0, 0.5))
    ma = out[("MA", 0)]
    assert (ma.re, ma.im, ma.modulus) == pytest.approx((-0.8, 0.0, 0.8))


def test_arma_roots_ar2_complex_pair(spark):
    # y_t = 1.0 y_{t-1} - 0.5 y_{t-2}: inverse roots are 0.5 +/- 0.5i
    rows = arma_roots_data(spark, ar=(1.0, -0.5)).collect()
    assert len(rows) == 2 and all(r.kind == "AR" for r in rows)
    assert sorted(round(r.im, 6) for r in rows) == [-0.5, 0.5]
    for r in rows:
        assert r.re == pytest.approx(0.5)
        assert r.modulus == pytest.approx(np.sqrt(0.5))
        assert r.modulus < 1.0  # stationary region

def test_arma_roots_empty(spark):
    assert arma_roots_data(spark).count() == 0


def test_arma_irf_ar1_and_arma11(spark):
    from feasts_spark.operators.seasonal import arma_irf_data

    # AR(1): psi_h = phi^h
    out = {r.h: r.psi for r in arma_irf_data(spark, ar=(0.6,), horizon=6).collect()}
    for h in range(7):
        assert out[h] == pytest.approx(0.6 ** h)
    # ARMA(1,1): psi_1 = phi + theta, psi_j = phi * psi_{j-1} afterwards
    out = {r.h: r.psi for r in
           arma_irf_data(spark, ar=(0.5,), ma=(0.3,), horizon=5).collect()}
    assert out[0] == 1.0
    assert out[1] == pytest.approx(0.8)
    for h in range(2, 6):
        assert out[h] == pytest.approx(0.8 * 0.5 ** (h - 1))
    # pure MA(2) truncates at q
    out = {r.h: r.psi for r in
           arma_irf_data(spark, ma=(0.4, 0.2), horizon=4).collect()}
    assert [out[h] for h in range(5)] == pytest.approx([1.0, 0.4, 0.2, 0.0, 0.0])
    with pytest.raises(ValueError):
        arma_irf_data(spark, horizon=0)
