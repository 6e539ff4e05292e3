"""STL + classical decomposition on USAccDeaths — the reference's central
oracle series (test-stl.R:3-24, test-classical.R:26-47).

The R-side oracle is `stats::stl(USAccDeaths, s.window=11)` /
`stats::decompose(USAccDeaths, type="multiplicative")`; without an R
runtime the transcribed checks are the structural identities those
oracles guarantee plus the feat_stl goldens elsewhere (fdeaths, WWWusage)
that pin the same STL code path numerically.
"""

import numpy as np

from feasts_spark.kernels.stl import estimate_stl
from feasts_spark.operators.decompose import classical_decompose_kernel
from tests.fixtures.r_series import USACCDEATHS


def test_stl_reconstruction_and_shape():
    d = estimate_stl(USACCDEATHS, periods=(12,), s_windows=(11,),
                     period_names=("year",))
    y = USACCDEATHS
    # value = trend + season + remainder (stl.R:108-112 alias), exact
    np.testing.assert_allclose(
        d["trend"] + d["season_year"] + d["remainder"], y, rtol=0, atol=1e-8
    )
    # season_adjust = y - season = trend + remainder
    np.testing.assert_allclose(
        d["season_adjust"], y - d["season_year"], rtol=0, atol=1e-8
    )
    # seasonal component is ~periodic: successive years highly correlated
    s = d["season_year"][: 60].reshape(5, 12)
    c = np.corrcoef(s)
    assert c[np.triu_indices(5, 1)].min() > 0.95
    # trend is smooth: total variation far below the raw series'
    assert np.abs(np.diff(d["trend"])).sum() < 0.35 * np.abs(np.diff(y)).sum()
    # components explain most variance
    assert np.var(d["remainder"]) < 0.1 * np.var(y)


def test_classical_multiplicative_identities():
    out = classical_decompose_kernel(USACCDEATHS, 12, type="multiplicative")
    y = USACCDEATHS
    trend, seasonal, random = out["trend"], out["seasonal"], out["random"]
    # R decompose: figure normalized so the 12 seasonal indices average 1
    np.testing.assert_allclose(seasonal[:12].mean(), 1.0, atol=1e-12)
    # seasonal tiles exactly (period-12 repeat)
    np.testing.assert_allclose(seasonal[:12], seasonal[12:24], atol=1e-12)
    # y = trend * seasonal * random where defined
    ok = ~np.isnan(trend)
    np.testing.assert_allclose(
        (trend * seasonal * random)[ok], y[ok], rtol=1e-10
    )
    # season_adjust = y / seasonal
    np.testing.assert_allclose(out["season_adjust"], y / seasonal, rtol=1e-12)
    # trend NaN pad: centered MA -> 6 on each end (even period)
    assert np.isnan(trend[:6]).all() and np.isnan(trend[-6:]).all()
    assert not np.isnan(trend[6:-6]).any()


def test_reconstruction_guard_throws_on_corrupted_component(spark):
    """The in-plan raise_error certificate (q_stl_decomp_suite pattern):
    a corrupted component column must make the query THROW at execution
    time, not return rows."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from feasts_spark.operators.decompose import (
        reconstruction_ok,
        stl_components,
    )

    rows = pd.DataFrame({
        "series_key": 1,
        "bucket_ts": pd.date_range("2024-01-01", periods=60, freq="D"),
        "val_avg": np.sin(np.arange(60) * 2 * np.pi / 7) * 3
        + np.arange(60) * 0.1 + 10.0,
    })
    wide = stl_components(
        spark.createDataFrame(rows), periods=(7,), value_col="val_avg"
    )
    ok = reconstruction_ok("val_avg", ["trend", "season_7", "remainder"])
    guard = F.raise_error(F.lit("stl invariant violated")).cast("double")

    # intact components: every row passes the certificate
    good = wide.select(F.when(ok, F.col("trend")).otherwise(guard).alias("v"))
    assert good.count() == 60

    # corrupt ONE component -> the identical guarded plan must throw
    bad = wide.withColumn("trend", F.col("trend") + 1.0).select(
        F.when(ok, F.col("trend")).otherwise(guard).alias("v")
    )
    with pytest.raises(Exception, match="stl invariant violated"):
        bad.collect()
