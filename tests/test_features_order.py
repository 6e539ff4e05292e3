"""features() must be invariant to input row order (argsort path) and to
partitioning — the series order comes from order_col alone."""

import numpy as np
import pandas as pd

from feasts_spark.operators.features import compute_feature_pack, features


def test_features_input_order_invariant(spark):
    rng = np.random.default_rng(3)
    rows = []
    for key in ("a", "b"):
        vals = np.cumsum(rng.standard_normal(300))
        for i, v in enumerate(vals):
            rows.append((key, i, float(v)))
    df = spark.createDataFrame(rows, "series_key string, t int, v double")
    shuffled = spark.createDataFrame(
        pd.DataFrame(rows, columns=["series_key", "t", "v"]).sample(
            frac=1.0, random_state=7
        ),
    )
    a = (
        features(df, key_col="series_key", order_col="t", value_col="v", period=12)
        .orderBy("series_key")
        .toPandas()
    )
    b = (
        features(
            shuffled.repartition(13),
            key_col="series_key", order_col="t", value_col="v", period=12,
        )
        .orderBy("series_key")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)
    # and the spark result matches the kernel called directly on the
    # ordered series
    for key in ("a", "b"):
        x = np.array([r[2] for r in rows if r[0] == key])
        direct = compute_feature_pack(x, period=12)
        got = a[a["series_key"] == key].iloc[0]
        for col, expect in direct.items():
            gv = got[col]
            if np.isnan(expect):
                assert np.isnan(gv), col
            else:
                np.testing.assert_allclose(gv, expect, rtol=1e-9, err_msg=col)


class TestMultiSeasonPack:
    """Per-season feature columns (features.R:95-108) through the pack."""

    def test_two_season_synthetic_golden(self, spark):
        # reference test-stl.R:47-80: y = rep(1:4) + rep(1:7) over 100 pts;
        # season_4 ~ rep(1:4)-2.5 (peak idx 4 -> 4%%4=0, trough idx 1),
        # season_7 ~ rep(1:7)-4 (peak 7%%7=0, trough 1), remainder ~ 0.
        import numpy as np
        import pandas as pd

        y = (np.arange(100) % 4 + 1 + np.arange(100) % 7 + 1).astype(float)
        pdf = pd.DataFrame({"series_key": "s", "t": np.arange(100), "v": y})
        df = spark.createDataFrame(pdf)
        out = features(
            df, key_col="series_key", order_col="t", value_col="v",
            period=(4, 7),
        ).toPandas()
        row = out.iloc[0]
        for p in (4, 7):
            assert row[f"seasonal_strength_{p}"] > 0.99
            assert row[f"seasonal_peak_{p}"] == 0.0
            assert row[f"seasonal_trough_{p}"] == 1.0
        # legacy unsuffixed columns must NOT appear in the multi schema
        assert "seasonal_strength" not in out.columns
        assert "trend_strength" in out.columns

    def test_single_period_schema_unchanged(self, spark):
        import numpy as np
        import pandas as pd

        from feasts_spark.operators.features import FEATURE_COLUMNS

        pdf = pd.DataFrame({
            "series_key": "s", "t": np.arange(60),
            "v": np.sin(np.arange(60) / 3.0),
        })
        out = features(
            spark.createDataFrame(pdf), key_col="series_key", order_col="t",
            value_col="v", period=12,
        ).toPandas()
        assert list(out.columns) == ["series_key"] + FEATURE_COLUMNS

    def test_giant_series_guard(self, spark):
        import numpy as np
        import pandas as pd

        pdf = pd.DataFrame({
            "series_key": "whale", "t": np.arange(500),
            "v": np.random.RandomState(0).standard_normal(500),
        })
        df = spark.createDataFrame(pdf)
        import pytest as _pytest

        with _pytest.raises(Exception, match="max_points"):
            features(
                df, key_col="series_key", order_col="t", value_col="v",
                period=1, max_points=100,
            ).collect()


class TestFeatureSet:
    def test_registry_columns_cover_pack(self):
        from feasts_spark.operators.features import (
            FEATURE_COLUMNS,
            FEATURE_REGISTRY,
            KERNEL_COLUMNS,
        )

        assert set(KERNEL_COLUMNS) == set(FEATURE_REGISTRY)
        covered = {c for cols in KERNEL_COLUMNS.values() for c in cols}
        assert covered == set(FEATURE_COLUMNS)

    def test_feature_set_resolution(self):
        from feasts_spark.operators.features import feature_set

        assert feature_set(tags=("portmanteau",)) == ("box_pierce", "ljung_box")
        assert "feat_acf" in feature_set(tags=("autocorrelation",))
        assert feature_set(names=("guerrero",)) == ("guerrero",)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            feature_set(names=("nope",))
        with _pytest.raises(ValueError):
            feature_set(tags=("no-such-tag",))

    def test_subset_matches_full_pack(self):
        import numpy as np

        from feasts_spark.operators.features import (
            compute_feature_pack,
            feature_set,
        )

        rng = np.random.RandomState(4)
        x = np.cumsum(rng.standard_normal(300)) + 5 * np.sin(
            np.arange(300) * 2 * np.pi / 12
        )
        full = compute_feature_pack(x, period=12)
        sel = feature_set(tags=("autocorrelation", "unitroot"), names=("guerrero",))
        sub = compute_feature_pack(x, period=12, select=sel)
        assert set(sub) < set(full)
        for k, v in sub.items():
            assert (np.isnan(v) and np.isnan(full[k])) or v == full[k], k

    def test_spark_select(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from feasts_spark.operators.features import feature_set, features
        from feasts_spark.operators.rollup import rollup_raw

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        r = rollup_raw(ev, "1d", "user_id", "ts", "value")
        sel = feature_set(tags=("acf",), names=("n_crossing_points",))
        out = features(r, period=7, min_points=10, select=sel)
        assert set(out.columns) == {
            "series_key", "acf1", "acf10", "diff1_acf1", "diff1_acf10",
            "diff2_acf1", "diff2_acf10", "season_acf1", "n_crossing_points",
        }
        full = features(r, period=7, min_points=10).select(
            "series_key", "acf1", "n_crossing_points"
        )
        j = out.select("series_key", "acf1", "n_crossing_points").join(
            full.withColumnRenamed("acf1", "acf1_f").withColumnRenamed(
                "n_crossing_points", "ncp_f"
            ),
            "series_key",
        )
        bad = j.filter(
            (F.col("acf1") != F.col("acf1_f"))
            | (F.col("n_crossing_points") != F.col("ncp_f"))
        ).count()
        assert bad == 0 and j.count() > 0
