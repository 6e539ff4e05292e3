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
