"""Unit tests for the round-3 operators: as-of join, M4 downsampling,
counter rate, EWMA, calendar profile."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from feasts_spark.operators.asof import asof_join
from feasts_spark.operators.downsample import m4_downsample
from feasts_spark.operators.rate import counter_increase
from feasts_spark.operators.smooth import calendar_profile, ewma, ewma_kernel


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def test_asof_join_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 200).astype(str),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, 200), unit="s"),
        "payload": np.arange(200),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 80).astype(str),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, 80), unit="s"),
        "ref": rng.normal(size=80),
    }).drop_duplicates(["k", "ts"])

    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.rename(columns={"ts": "rts"})),
            "k", "ts", "rts", ["ref"],
        )
        .toPandas()
        .sort_values(["k", "ts", "payload"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts", by="k", direction="backward", suffixes=("", "_r"),
    ).sort_values(["k", "ts", "payload"]).reset_index(drop=True)
    assert len(out) == len(exp)
    pd.testing.assert_series_equal(
        out["ref"], exp["ref"], check_names=False, check_exact=False
    )


def test_asof_join_exact_ts_and_tolerance(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:10:00"), 1)], ["k", "ts", "p"]
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:10:00"), 5.0),
         ("a", _ts("2024-01-01T00:00:00"), 3.0)],
        ["k", "rts", "ref"],
    )
    # exact-timestamp right row matches (inclusive semantics)
    row = asof_join(left, right, "k", "ts", "rts", ["ref"]).collect()[0]
    assert row["ref"] == 5.0
    # tolerance: only the t-10min row exists -> outside 60 s tolerance
    right2 = right.filter("ref = 3.0")
    row2 = asof_join(
        left, right2, "k", "ts", "rts", ["ref"], tolerance_seconds=60
    ).collect()[0]
    assert row2["ref"] is None and row2["match_ts"] is None
    row3 = asof_join(
        left, right2, "k", "ts", "rts", ["ref"], tolerance_seconds=3600
    ).collect()[0]
    assert row3["ref"] == 3.0


def test_asof_join_rejects_reserved_column_names(spark):
    """ADVICE r03: a left frame already carrying match_ts (or an
    underscore-internal name) must raise instead of silently producing
    duplicate/ambiguous output columns."""
    import pytest

    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:00"), 3.0)], ["k", "rts", "ref"]
    )
    for bad in ("match_ts", "_k", "_rv"):
        left = spark.createDataFrame(
            [("a", _ts("2024-01-01T00:10:00"), 1)], ["k", "ts", bad]
        )
        with pytest.raises(ValueError, match="reserved"):
            asof_join(left, right, "k", "ts", "rts", ["ref"])


# ---------------------------------------------------------------------------
# M4
# ---------------------------------------------------------------------------

def test_m4_downsample_picks_four_extremes(spark):
    rows = []
    base = _ts("2024-01-01T00:00:00")
    vals = [5.0, 1.0, 9.0, 4.0, 9.0]  # duplicate max -> tie broken by id
    for i, v in enumerate(vals):
        rows.append(("a", base + dt.timedelta(minutes=10 * i), v, i))
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    out = m4_downsample(df, "1h", "k", "ts", "v", tie_col="eid").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 5
    assert (r["first_val"], r["last_val"]) == (5.0, 9.0)
    assert (r["min_val"], r["max_val"]) == (1.0, 9.0)
    # duplicate max value: lexicographic struct-max takes the LATER (v, ts)
    assert r["max_ts"] == base + dt.timedelta(minutes=40)
    assert r["min_ts"] == base + dt.timedelta(minutes=10)


def test_m4_cascades_like_rollup(spark, sf_dir):
    """1m M4 re-aggregated to 1h must equal 1h M4 computed from raw."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = m4_downsample(e, "1h", "user_id", "ts", "value", "event_id")
    # recompute from the 1m tier: min/max of structs nest, so running M4
    # over the 1m *points* with (val,ts) pairs reproduces the 1h row
    from pyspark.sql import functions as F
    m1 = m4_downsample(e, "1m", "user_id", "ts", "value", "event_id")
    re_agg = (
        m1.groupBy(
            "series_key", F.date_trunc("hour", "bucket_ts").alias("bucket_ts")
        )
        .agg(
            F.sum("n_points").alias("n_points"),
            F.min(F.struct(F.col("first_ts").alias("t"),
                           F.col("first_val").alias("v"))).alias("_f"),
            F.max(F.struct(F.col("last_ts").alias("t"),
                           F.col("last_val").alias("v"))).alias("_l"),
            F.min(F.struct(F.col("min_val").alias("v"),
                           F.col("min_ts").alias("t"))).alias("_mn"),
            F.max(F.struct(F.col("max_val").alias("v"),
                           F.col("max_ts").alias("t"))).alias("_mx"),
        )
        .select(
            "series_key", "bucket_ts", "n_points",
            F.col("_f.t").alias("first_ts"), F.col("_f.v").alias("first_val"),
            F.col("_l.t").alias("last_ts"), F.col("_l.v").alias("last_val"),
            F.col("_mn.v").alias("min_val"), F.col("_mn.t").alias("min_ts"),
            F.col("_mx.v").alias("max_val"), F.col("_mx.t").alias("max_ts"),
        )
    )
    a = direct.toPandas().sort_values(["series_key", "bucket_ts"]).reset_index(drop=True)
    b = re_agg.toPandas().sort_values(["series_key", "bucket_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)


# ---------------------------------------------------------------------------
# counter rate
# ---------------------------------------------------------------------------

def test_counter_increase_resets(spark):
    base = _ts("2024-01-01T00:00:00")
    # counter: 10, 15, 3 (reset), 7 -> increases 5, 3, 4 ; first point none
    rows = [("a", base + dt.timedelta(minutes=i), v, i)
            for i, v in enumerate([10.0, 15.0, 3.0, 7.0])]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    out = counter_increase(df, "1h", "k", "ts", "v", ["eid"]).collect()
    assert len(out) == 1
    assert out[0]["increase"] == pytest.approx(12.0)
    assert out[0]["n_resets"] == 1
    assert out[0]["n_samples"] == 4


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("alpha", [0.1, 0.3, 0.9])
@pytest.mark.parametrize("n", [1, 5, 255, 256, 257, 2000])
def test_ewma_kernel_matches_recursion(alpha, n):
    rng = np.random.default_rng(n)
    x = rng.normal(scale=100.0, size=n)
    got = ewma_kernel(x, alpha)
    exp = np.empty(n)
    exp[0] = x[0]
    for i in range(1, n):
        exp[i] = alpha * x[i] + (1 - alpha) * exp[i - 1]
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-9)


def test_ewma_df_ordering(spark):
    base = _ts("2024-01-01T00:00:00")
    rows = [("a", base + dt.timedelta(hours=i), float(v))
            for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, ["series_key", "bucket_ts", "val_avg"])
    out = (
        ewma(df, 0.5)
        .orderBy("bucket_ts")
        .select("ewma")
        .toPandas()["ewma"]
        .to_numpy()
    )
    np.testing.assert_allclose(out, [1.0, 1.5, 2.25, 3.125])


# ---------------------------------------------------------------------------
# calendar profile
# ---------------------------------------------------------------------------

def test_calendar_profile_shapes(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = calendar_profile(e, "user_id", "ts", "value").toPandas()
    assert set(out["dim"]) == {"hod", "dow"}
    hod = out[out["dim"] == "hod"]
    assert hod["idx"].between(0, 23).all()
    dow = out[out["dim"] == "dow"]
    assert dow["idx"].between(1, 7).all()
    # counts add back up to the table size per dim
    n = e.count()
    assert hod["n_points"].sum() == n
    assert dow["n_points"].sum() == n


def test_asof_join_carries_null_values_atomically(spark):
    """The matched right row wins as a WHOLE: a legitimately-NULL value on
    the newest right row must come through as NULL, not be stitched from
    an older row (round-3 regression)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from feasts_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    right = spark.createDataFrame(
        [("k", t(5), 7.0, 1.0), ("k", t(10), None, 2.0)],
        "k string, rts timestamp, v double, w double",
    )
    left = spark.createDataFrame(
        [("k", t(12)), ("k", t(7))], "k string, ts timestamp"
    )
    out = {
        r.ts: (r.v, r.w, r.match_ts)
        for r in asof_join(left, right, "k", "ts", "rts", ["v", "w"]).collect()
    }
    # ts=12 matches the ts=10 row: v must be NULL (not 7.0 from ts=5)
    assert out[t(12)] == (None, 2.0, t(10))
    assert out[t(7)] == (7.0, 1.0, t(5))


def test_ewma_kernel_extreme_alpha_finite(spark):
    import numpy as np

    from feasts_spark.operators.smooth import ewma_kernel

    x = np.random.RandomState(1).randn(2000) * 100
    for alpha in (0.95, 0.999, 1.0, 0.0):
        y = ewma_kernel(x, alpha)
        assert np.isfinite(y).all(), alpha
    # exact recursion parity at a high alpha
    ref = np.empty_like(x)
    ref[0] = x[0]
    for i in range(1, x.size):
        ref[i] = 0.97 * x[i] + 0.03 * ref[i - 1]
    np.testing.assert_allclose(ewma_kernel(x, 0.97), ref, rtol=1e-10)


def test_asof_join_timestamp_tiebreak_column(spark):
    """right_order may be ANY orderable column — a timestamp tiebreak must
    not fail the union with the left side's tie slot (round-3 review
    finding: the left literal 0 clashed with non-numeric tie types)."""
    import datetime as dt

    from feasts_spark.operators.asof import asof_join

    t = dt.datetime(2024, 1, 1, 0, 0, 0)
    right = spark.createDataFrame(
        [
            (1, t, 10.0, dt.datetime(2024, 1, 1, 5)),   # updated later
            (1, t, 20.0, dt.datetime(2024, 1, 1, 9)),   # latest update wins
        ],
        "user_id long, bucket_ts timestamp, val_avg double, updated_at timestamp",
    )
    left = spark.createDataFrame(
        [(1, t + dt.timedelta(minutes=5))], "user_id long, ts timestamp"
    )
    out = asof_join(
        left, right, "user_id", "ts", "bucket_ts", ["val_avg"],
        right_order="updated_at",
    ).collect()
    assert len(out) == 1
    # the LAST right row in (ts, updated_at) order is the match
    assert out[0].val_avg == 20.0
