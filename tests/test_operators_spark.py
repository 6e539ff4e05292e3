"""Spark operator tests: rollup cascade, gap-fill, cf/features parity,
classical decomposition SQL-vs-kernel, Gorilla round-trip, skew, resume."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.rollup import rollup_cascade, rollup_raw, rollup_tiers
from feasts_spark.operators.gapfill import gapfill_linear, gapfill_locf
from feasts_spark.operators.cf import acf_table, pacf_table
from feasts_spark.operators.decompose import (
    classical_decompose_kernel,
    classical_decomposition,
    stl_components,
)
from feasts_spark.operators.compression import (
    compress_chunks,
    decompress_chunks,
    gorilla_decode,
    gorilla_encode,
)
from feasts_spark.operators.skew import salted_rollup
from feasts_spark.kernels.acf import acf_r


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


class TestRollup:
    @staticmethod
    def _assert_tier_equal(a, b):
        """Cascade vs direct: counts/min/max/first/last are BITWISE equal;
        sums/averages only differ in summation order (fp associativity), so
        those compare at 1e-12 relative."""
        exact = ["series_key", "bucket_ts", "n_points", "val_min", "val_max",
                 "val_first", "val_last", "first_ts", "last_ts"]
        pd.testing.assert_frame_equal(a[exact], b[exact], check_exact=True)
        np.testing.assert_allclose(a["val_sum"], b["val_sum"], rtol=1e-12)
        np.testing.assert_allclose(a["val_avg"], b["val_avg"], rtol=1e-12)

    def test_cascade_equals_direct(self, spark, events):
        """1h from 1m must equal 1h from raw — tier composability."""
        tiers = rollup_tiers(events, key_col="user_id", ts_col="ts", value_col="value")
        direct_1h = rollup_raw(events, "1h", "user_id", "ts", "value")
        a = tiers["1h"].orderBy("series_key", "bucket_ts").toPandas()
        b = direct_1h.orderBy("series_key", "bucket_ts").toPandas()
        self._assert_tier_equal(a, b)
        direct_1d = rollup_raw(events, "1d", "user_id", "ts", "value")
        a = tiers["1d"].orderBy("series_key", "bucket_ts").toPandas()
        b = direct_1d.orderBy("series_key", "bucket_ts").toPandas()
        self._assert_tier_equal(a, b)

    def test_rollup_values(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        pdf = r.toPandas()
        raw = events.toPandas()
        raw["bucket_ts"] = raw["ts"].dt.floor("D")
        exp = (
            raw.groupby(["user_id", "bucket_ts"])["value"]
            .agg(["count", "sum", "min", "max", "mean"])
            .reset_index()
            .rename(columns={"user_id": "series_key"})
        )
        merged = exp.merge(pdf, on=["series_key", "bucket_ts"], how="outer")
        assert len(merged) == len(exp) == len(pdf)
        assert (merged["count"] == merged["n_points"]).all()
        np.testing.assert_allclose(merged["sum"], merged["val_sum"])
        np.testing.assert_allclose(merged["mean"], merged["val_avg"])
        np.testing.assert_array_equal(merged["min"], merged["val_min"])
        np.testing.assert_array_equal(merged["max"], merged["val_max"])


class TestGapfill:
    def test_locf(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        g = gapfill_locf(r, "1d", value_cols=("val_avg",))
        pdf = g.orderBy("series_key", "bucket_ts").toPandas()
        # grid is dense per key
        for key, grp in pdf.groupby("series_key"):
            diffs = grp["bucket_ts"].diff().dropna()
            assert (diffs == pd.Timedelta(days=1)).all()
            # locf equals pandas ffill
            expected = grp["val_avg"].ffill()
            pd.testing.assert_series_equal(
                grp["val_avg_filled"], expected, check_names=False
            )

    def test_linear(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        g = gapfill_linear(r, "1d", value_col="val_avg")
        pdf = g.orderBy("series_key", "bucket_ts").toPandas()
        for key, grp in pdf.groupby("series_key"):
            s = grp.set_index("bucket_ts")["val_avg"]
            expected = s.interpolate(method="time", limit_direction="both")
            np.testing.assert_allclose(
                grp["val_avg_interp"].to_numpy(), expected.to_numpy(), rtol=1e-9
            )


class TestCfOperators:
    def test_acf_table_matches_kernel(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        out = acf_table(r).toPandas()
        local = r.orderBy("series_key", "bucket_ts").toPandas()
        for key, grp in local.groupby("series_key"):
            x = grp["val_avg"].to_numpy()
            expected = acf_r(x, na_action="contiguous")[1:]
            got = out[out["series_key"] == key].sort_values("lag")["acf"].to_numpy()
            np.testing.assert_allclose(got, expected, rtol=1e-12)


class TestClassical:
    def test_sql_matches_kernel(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        for typ in ("additive", "multiplicative"):
            out = (
                classical_decomposition(r, period=7, type=typ)
                .orderBy("series_key", "bucket_ts")
                .toPandas()
            )
            for key, grp in out.groupby("series_key"):
                y = grp["val_avg"].to_numpy()
                if len(y) < 14:
                    continue
                exp = classical_decompose_kernel(y, 7, type=typ)
                np.testing.assert_allclose(
                    grp["trend"].to_numpy(), exp["trend"], rtol=1e-9, equal_nan=True
                )
                np.testing.assert_allclose(
                    grp["seasonal"].to_numpy(), exp["seasonal"], rtol=1e-9
                )
                np.testing.assert_allclose(
                    grp["random"].to_numpy(), exp["random"], rtol=1e-9, equal_nan=True
                )


class TestStlComponents:
    def test_alias_invariants(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        # keep only keys with enough points for period 7 (> 2 periods)
        counts = r.groupBy("series_key").count().filter(F.col("count") > 14)
        r = r.join(counts.select("series_key"), "series_key")
        comp = stl_components(r, periods=(7,), value_col="val_avg").toPandas()
        recon = comp["trend"] + comp["season_7"] + comp["remainder"]
        np.testing.assert_allclose(recon, comp["val_avg"], rtol=1e-9)
        np.testing.assert_allclose(
            comp["season_adjust"], comp["trend"] + comp["remainder"], rtol=1e-9
        )


class TestGorilla:
    def test_roundtrip_exact(self):
        rng = np.random.RandomState(7)
        ts = np.cumsum(rng.randint(1, 1_000_000, 500)).astype(np.int64)
        vals = rng.standard_normal(500) * 1e6
        vals[::7] = 0.0  # repeated values exercise the xor==0 path
        payload = gorilla_encode(ts, vals)
        ts2, vals2 = gorilla_decode(payload)
        np.testing.assert_array_equal(ts, ts2)
        assert np.array_equal(
            vals.view(np.uint64), vals2.view(np.uint64)
        ), "bitwise value mismatch"

    def test_roundtrip_regular_grid(self):
        ts = (np.arange(1000, dtype=np.int64) * 60_000_000) + 1_700_000_000_000_000
        vals = np.round(np.sin(np.arange(1000) / 10.0) * 100, 2)
        payload = gorilla_encode(ts, vals)
        # regular grid: dod == 0 after the first delta; decimal-rounded
        # doubles XOR poorly, so ~8 B/pt vs 16 raw
        assert len(payload) < 1000 * 16 * 0.6
        ts2, vals2 = gorilla_decode(payload)
        np.testing.assert_array_equal(ts, ts2)
        assert np.array_equal(vals.view(np.uint64), vals2.view(np.uint64))
        # slowly-changing integral values compress hard (<2.5 B/pt)
        vals3 = np.floor(np.arange(1000) / 50.0) * 4.0
        p3 = gorilla_encode(ts, vals3)
        assert len(p3) < 1000 * 2.5
        t3, v3 = gorilla_decode(p3)
        np.testing.assert_array_equal(ts, t3)
        assert np.array_equal(vals3.view(np.uint64), v3.view(np.uint64))

    def test_spark_chunks(self, spark, events):
        r = rollup_raw(events, "1h", "user_id", "ts", "value").withColumn(
            "series_key", F.col("series_key").cast("string")
        )
        chunks = compress_chunks(r, "1h")
        back = decompress_chunks(chunks).toPandas()
        orig = r.select("series_key", "bucket_ts", "val_avg").toPandas()
        back = back.sort_values(["series_key", "bucket_ts"]).reset_index(drop=True)
        orig = orig.sort_values(["series_key", "bucket_ts"]).reset_index(drop=True)
        assert len(back) == len(orig)
        np.testing.assert_array_equal(
            back["value"].to_numpy().view(np.uint64),
            orig["val_avg"].to_numpy().view(np.uint64),
        )
        pd.testing.assert_series_equal(
            back["bucket_ts"], orig["bucket_ts"], check_names=False
        )


class TestSkew:
    def test_salted_equals_plain(self, spark, events):
        plain = rollup_raw(events, "1h", "user_id", "ts", "value")
        salted = salted_rollup(
            events, "1h", key_col="user_id", ts_col="ts", value_col="value",
            heavy_threshold=10,  # force most keys through the salted path
        )
        a = plain.orderBy("series_key", "bucket_ts").toPandas()
        b = salted.orderBy("series_key", "bucket_ts").toPandas()
        pd.testing.assert_frame_equal(a, b, check_exact=True)


class TestSqlFeatureTwins:
    """SQL-native kpss_df / pacf12_df must match the numpy kernels."""

    def test_kpss_sql_matches_kernel(self, spark, events):
        import numpy as np

        from feasts_spark.functions import kpss_df
        from feasts_spark.kernels.stat_tests import unitroot_kpss

        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        counts = r.groupBy("series_key").count().filter(F.col("count") >= 14)
        r = r.join(counts.select("series_key"), "series_key")
        got = (
            kpss_df(r, "series_key", ["bucket_ts"], "val_avg")
            .toPandas()
            .set_index("series_key")
            .sort_index()
        )
        local = r.orderBy("series_key", "bucket_ts").toPandas()
        assert len(got) > 3
        for key, grp in local.groupby("series_key"):
            exp = unitroot_kpss(grp["val_avg"].to_numpy())
            assert got.loc[key, "kpss_stat"] == pytest.approx(
                exp["kpss_stat"], rel=1e-9
            )
            assert got.loc[key, "kpss_pvalue"] == pytest.approx(
                exp["kpss_pvalue"], rel=1e-9
            )

    def test_kpss_long_series_nulls_not_truncated(self, spark):
        # l = trunc(4*(n/100)^0.25) exceeds l_max=12 at n >= 11,156: the
        # statistic must come back NULL, never silently truncated
        from feasts_spark.functions import kpss_df

        n = 12_000
        df = spark.range(n).selectExpr(
            "'k' AS series_key", "id AS bucket_ts",
            "sin(id / 50.0) + id * 1e-4 AS val_avg",
        )
        out = kpss_df(df, "series_key", ["bucket_ts"], "val_avg").toPandas()
        assert len(out) == 1
        assert pd.isna(out["kpss_stat"].iloc[0])
        assert pd.isna(out["kpss_pvalue"].iloc[0])
        # raising l_max restores the exact statistic
        out2 = kpss_df(
            df, "series_key", ["bucket_ts"], "val_avg", l_max=16
        ).toPandas()
        assert not pd.isna(out2["kpss_stat"].iloc[0])

    def test_pacf12_sql_matches_kernel(self, spark, events):
        import numpy as np

        from feasts_spark.functions import pacf12_df
        from feasts_spark.kernels.acf import pacf_r

        r = rollup_raw(events, "1h", "user_id", "ts", "value")
        counts = r.groupBy("series_key").count().filter(F.col("count") > 11)
        r = r.join(counts.select("series_key"), "series_key")
        got = (
            pacf12_df(r, "series_key", ["bucket_ts"], "val_avg")
            .toPandas()
            .set_index("series_key")
            .sort_index()
        )
        local = r.orderBy("series_key", "bucket_ts").toPandas()
        assert len(got) > 3
        for key, grp in local.groupby("series_key"):
            exp = pacf_r(grp["val_avg"].to_numpy(), lag_max=2)
            assert got.loc[key, "pacf1"] == pytest.approx(exp[0], rel=1e-9)
            assert got.loc[key, "pacf2"] == pytest.approx(exp[1], rel=1e-9)

    def test_pp_sql_matches_kernel(self, spark, events):
        from feasts_spark.functions.sql_features import pp_sql
        from feasts_spark.kernels.extras import unitroot_pp

        events.createOrReplaceTempView("events")
        got = spark.sql(pp_sql()).toPandas().set_index("series_key").sort_index()
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        counts = r.groupBy("series_key").count().filter(F.col("count") >= 14)
        r = r.join(counts.select("series_key"), "series_key")
        local = r.orderBy("series_key", "bucket_ts").toPandas()
        assert len(got) > 3
        for key, grp in local.groupby("series_key"):
            exp = unitroot_pp(grp["val_avg"].to_numpy())
            # SQL output is 4dp-rounded; kernel is exact
            assert got.loc[key, "pp_stat"] == pytest.approx(
                exp["pp_stat"], abs=2e-4
            )
            assert got.loc[key, "pp_pvalue"] == pytest.approx(
                exp["pp_pvalue"], abs=2e-4
            )

    def test_acf_features_sql_matches_kernel(self, spark, events):
        from feasts_spark.functions.sql_features import acf_features_sql
        from feasts_spark.kernels.feat_cf import feat_acf

        events.createOrReplaceTempView("events")
        got = (
            spark.sql(acf_features_sql())
            .toPandas()
            .set_index("series_key")
            .sort_index()
        )
        r = rollup_raw(events, "1h", "user_id", "ts", "value")
        counts = r.groupBy("series_key").count().filter(F.col("count") >= 30)
        r = r.join(counts.select("series_key"), "series_key")
        local = r.orderBy("series_key", "bucket_ts").toPandas()
        assert len(got) > 3
        cols = ["acf1", "acf10", "diff1_acf1", "diff1_acf10", "diff2_acf1",
                "diff2_acf10", "season_acf1"]
        for key, grp in local.groupby("series_key"):
            exp = feat_acf(grp["val_avg"].to_numpy(), period=24)
            for c in cols:
                assert got.loc[key, c] == pytest.approx(exp[c], abs=2e-4), c


class TestRetention:
    def test_enforce_retention_filters_and_pushes_down(self, spark, events):
        import datetime as dt

        from feasts_spark.operators.retention import (
            enforce_retention,
            retention_cutoff,
        )
        from feasts_spark.plans import plan_summary

        r = rollup_raw(events, "1m", "user_id", "ts", "value")
        now = events.agg(F.max("ts")).collect()[0][0]
        kept = enforce_retention(r, "1m", now, policy={"1m": "2 days"})
        cutoff = retention_cutoff(now, "1m", {"1m": "2 days"})
        local = kept.select("bucket_ts").toPandas()
        assert (local["bucket_ts"] >= cutoff).all()
        full = r.count()
        assert 0 < kept.count() < full
        # keep-forever tier: no filter at all
        assert enforce_retention(r, "1d", now).count() == full

    def test_expire_partitions_parquet(self, spark, events, tmp_path):
        import datetime as dt

        from feasts_spark.operators.retention import expire_partitions
        from feasts_spark.sources.tableio import TableIO, with_day_partition

        io = TableIO(spark, str(tmp_path))
        df = with_day_partition(events.limit(20_000), "ts")
        io.write(df, "ev", partition_by=("dt",))
        days = sorted(
            r["dt"] for r in io.read("ev").select("dt").distinct().collect()
        )
        assert len(days) >= 3
        now = dt.datetime.combine(days[-1], dt.time()) + dt.timedelta(days=1)
        keep_days = 2
        removed = expire_partitions(
            io, "ev", "1m", now, policy={"1m": f"{keep_days + 1} days"}
        )
        assert removed  # something aged out
        left = sorted(
            r["dt"] for r in io.read("ev").select("dt").distinct().collect()
        )
        assert all(d.isoformat() not in removed for d in left)
        assert days[-1] in left  # newest partition survives


class TestSessionize:
    def test_gap_splits(self, spark):
        import datetime as dt

        import pandas as pd

        base = dt.datetime(2024, 1, 1)
        rows = []
        # key 1: gaps 10s,10s | 2h | 5s  -> sessions [0,0,0,1,1]
        offs = [0, 10, 20, 7220, 7225]
        rows += [(1, base + dt.timedelta(seconds=o), float(i))
                 for i, o in enumerate(offs)]
        # key 2: single event
        rows += [(2, base, 9.0)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        )
        from feasts_spark.operators.sessionize import session_stats, sessionize

        s = sessionize(df, gap_seconds=3600).orderBy("user_id", "ts").toPandas()
        assert list(s[s.user_id == 1]["session_id"]) == [0, 0, 0, 1, 1]
        assert list(s[s.user_id == 2]["session_id"]) == [0]
        st = session_stats(df, 3600, value_col="value").toPandas()
        st = st.set_index(["series_key", "session_id"]).sort_index()
        assert st.loc[(1, 0), "n_events"] == 3
        assert st.loc[(1, 0), "duration_s"] == 20
        assert st.loc[(1, 1), "duration_s"] == 5
        assert st.loc[(2, 0), "n_events"] == 1


class TestLttb:
    def test_kernel_properties(self):
        import numpy as np

        from feasts_spark.operators.downsample import lttb_kernel

        rng = np.random.RandomState(0)
        n = 5000
        ts = np.cumsum(rng.randint(1, 10, n)).astype(np.int64)
        vals = np.sin(np.arange(n) / 50.0) * 100
        vals[1234] = 1e5  # spike must survive
        idx = lttb_kernel(ts, vals, 200)
        assert idx.size == 200
        assert idx[0] == 0 and idx[-1] == n - 1
        assert (np.diff(idx) > 0).all()
        assert 1234 in idx  # extremum preserved
        # short series pass through unchanged
        assert lttb_kernel(ts[:50], vals[:50], 200).size == 50

    def test_spark_downsample(self, spark, events):
        from feasts_spark.operators.downsample import lttb_downsample

        r = rollup_raw(events, "1h", "user_id", "ts", "value")
        out = lttb_downsample(r, n_out=20).toPandas()
        sizes = out.groupby("series_key").size()
        orig = out.groupby("series_key")["orig_n"].first()
        assert (sizes == orig.clip(upper=20)).all()


class TestHistSketch:
    def test_cascade_equals_direct(self, spark, events):
        from feasts_spark.operators.sketch import hist_cascade, hist_rollup

        h1m = hist_rollup(events, "1m", 0.0, 350.0, 64, key_col="user_id")
        h1d = hist_cascade(hist_cascade(h1m, "1h"), "1d")
        direct = hist_rollup(events, "1d", 0.0, 350.0, 64, key_col="user_id")
        a = h1d.orderBy("series_key", "bucket_ts").toPandas()
        b = direct.orderBy("series_key", "bucket_ts").toPandas()
        assert len(a) == len(b) > 0
        assert all(list(x) == list(y) for x, y in zip(a["hist"], b["hist"]))
        assert (a["n_points"].to_numpy() == b["n_points"].to_numpy()).all()

    def test_quantile_within_bin_width(self, spark, events):
        import numpy as np
        import pandas as pd

        from feasts_spark.operators.sketch import hist_quantile, hist_rollup

        lo, hi, nb = 0.0, 350.0, 64
        h1d = hist_rollup(events, "1d", lo, hi, nb, key_col="user_id")
        q = (
            hist_quantile(h1d, 0.5, lo, hi)
            .toPandas()
            .set_index(["series_key", "bucket_ts"])["q50"]
        )
        pdf = events.toPandas()
        pdf["day"] = pdf["ts"].dt.floor("D")
        exact = pdf.groupby(["user_id", "day"])["value"].quantile(0.5, interpolation="lower")
        width = (hi - lo) / nb
        errs = [
            abs(q.loc[(k, pd.Timestamp(d))] - m)
            for (k, d), m in exact.items()
            if lo <= m < hi  # clamp contract only holds inside the range
        ]
        assert np.max(errs) <= width + 1e-9


class TestAnomaly:
    def test_flags_match_pandas_type7(self, spark, events):
        import numpy as np

        from feasts_spark.operators.anomaly import anomaly_flags

        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        out = anomaly_flags(r, period=7, k=2.0).toPandas()
        assert out["is_anomaly"].notna().sum() > 0
        for key, sub in out.groupby("series_key"):
            rem = sub["remainder"].dropna()
            if len(rem) < 4:
                continue
            q1, med, q3 = np.quantile(rem, [0.25, 0.5, 0.75])  # type 7
            lo, hi = med - 2 * (q3 - q1), med + 2 * (q3 - q1)
            exp = (rem < lo) | (rem > hi)
            got = sub.loc[rem.index, "is_anomaly"].astype(bool)
            assert (exp.to_numpy() == got.to_numpy()).all(), key

    def test_injected_spike_flagged(self, spark):
        import datetime as dt

        import numpy as np
        import pandas as pd

        base = dt.datetime(2024, 1, 1)
        n = 56
        vals = 10 + np.sin(np.arange(n) * 2 * np.pi / 7)
        vals[30] = 500.0  # spike
        pdf = pd.DataFrame({
            "series_key": 1,
            "bucket_ts": [base + dt.timedelta(days=i) for i in range(n)],
            "val_avg": vals,
        })
        from feasts_spark.operators.anomaly import anomaly_flags

        out = anomaly_flags(spark.createDataFrame(pdf), period=7).toPandas()
        flagged = out[out["is_anomaly"] == True]  # noqa: E712
        assert (flagged["bucket_ts"].dt.day == 31).any()  # day index 30
        # classical decomposition spreads an outlier into (a) its +-3-day
        # MA trend window and (b) its cycle position's seasonal figure —
        # every flag must be explained by one of the two
        d = (flagged["bucket_ts"] - pdf.loc[30, "bucket_ts"]).dt.days
        day_idx = (flagged["bucket_ts"] - pdf.loc[0, "bucket_ts"]).dt.days
        assert ((abs(d) <= 3) | (day_idx % 7 == 30 % 7)).all()


class TestGuerreroProfile:
    def test_sql_matches_kernel_objective(self, spark, events):
        import numpy as np

        from feasts_spark.functions.sql_features import guerrero_profile_sql
        from feasts_spark.kernels.rmath import r_sd

        events.createOrReplaceTempView("events")
        got = (
            spark.sql(guerrero_profile_sql())
            .toPandas()
            .set_index("series_key")
            .sort_index()
        )
        local = (
            rollup_raw(events, "1d", "user_id", "ts", "value")
            .orderBy("series_key", "bucket_ts")
            .toPandas()
        )
        lambdas = (-0.9, -0.5, 0.0, 0.5, 1.0, 2.0)
        names = [
            f"cv_lambda_{str(l).replace('-', 'm').replace('.', '_')}"
            for l in lambdas
        ]
        checked = 0
        for key, grp in local.groupby("series_key"):
            if key not in got.index:
                continue
            x = grp["val_avg"].to_numpy()
            n = x.size
            n_sub = n // 7
            tail = x[n - n_sub * 7:]
            mat = tail.reshape(n_sub, 7).T
            mu = mat.mean(axis=0)
            sig = np.array([r_sd(mat[:, j]) for j in range(n_sub)])
            for lam, cname in zip(lambdas, names):
                rat = sig / mu ** (1.0 - lam)
                cv = r_sd(rat) / rat.mean()
                assert got.loc[key, cname] == pytest.approx(cv, abs=2e-4), (
                    key, lam
                )
            checked += 1
        assert checked > 3
