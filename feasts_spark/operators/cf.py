"""ACF / PACF / CCF table operators (reference acf.R:61-250).

The reference pattern is nest-by-key -> per-key stats::acf -> unnest
(build_cf, acf.R:224-250). The Spark-native equivalent is exactly
`groupBy(key).applyInPandas` — one shuffle on the series key, Arrow-batched
columnar exchange, numpy kernel per group (SURVEY.md §3 EP3).

Output is the long table (key, lag, value) like the reference tbl_cf; the
`num_obs` sidecar of build_cf (acf.R:236-240) is a groupBy().count().
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from feasts_spark.kernels.acf import acf_r, ccf_r, default_lag_max, pacf_r


def _ordered_values(pdf: pd.DataFrame, order_col: str, value_col: str) -> np.ndarray:
    pdf = pdf.sort_values(order_col, kind="mergesort")
    return pdf[value_col].to_numpy(dtype=np.float64)


def acf_table(
    df: DataFrame,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
    lag_max: int | None = None,
    type: str = "correlation",
    demean: bool = True,
    tapered: bool = False,
    min_points: int = 0,
) -> DataFrame:
    """ACF() — per-key autocorrelations, lag 0 dropped (acf.R:75-77).

    tapered=True uses the banded/tapered estimate with eigenvalue shrinkage
    (acf.R:69-71 -> tacf, acf.R:252-300).

    `min_points` drops short series INSIDE the UDF — equivalent to a
    count-filter semi-join upstream, but without the extra aggregate +
    join shuffles (the group is already in hand)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        if len(pdf) < min_points:
            return pd.DataFrame({key_col: [], "lag": [], "acf": []})
        x = _ordered_values(pdf, order_col, value_col)
        if tapered:
            from feasts_spark.kernels.extras import tacf

            lm = lag_max if lag_max is not None else default_lag_max(x.size)
            acf = tacf(x)[: lm + 1]
        else:
            acf = acf_r(x, lag_max=lag_max, demean=demean,
                        na_action="contiguous", type=type)
        vals = acf[1:]
        return pd.DataFrame(
            {key_col: key, "lag": np.arange(1, vals.size + 1, dtype=np.int32),
             "acf": vals}
        )

    schema = f"{key_col} {df.schema[key_col].dataType.simpleString()}, lag int, acf double"
    return df.groupBy(key_col).applyInPandas(fn, schema=schema)


def pacf_table(
    df: DataFrame,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
    lag_max: int | None = None,
    tapered: bool = False,
    min_points: int = 0,
) -> DataFrame:
    """PACF() — per-key partial autocorrelations (Durbin-Levinson).

    `tapered=True` runs the recursion on the tacf() banded/tapered
    autocorrelation estimate instead of the sample ACF (reference
    acf.R:118-138, PACF(tapered=TRUE)). `min_points` filters short series
    inside the UDF (see acf_table)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from feasts_spark.kernels.extras import pacf_tapered

        key = pdf[key_col].iloc[0]
        if len(pdf) < min_points:
            return pd.DataFrame({key_col: [], "lag": [], "pacf": []})
        x = _ordered_values(pdf, order_col, value_col)
        if tapered:
            vals = pacf_tapered(x, lag_max=lag_max)
        else:
            vals = pacf_r(x, lag_max=lag_max, na_action="contiguous")
        return pd.DataFrame(
            {key_col: key, "lag": np.arange(1, vals.size + 1, dtype=np.int32),
             "pacf": vals}
        )

    schema = f"{key_col} {df.schema[key_col].dataType.simpleString()}, lag int, pacf double"
    return df.groupBy(key_col).applyInPandas(fn, schema=schema)


def ccf_table(
    df: DataFrame,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    y_col: str = "y",
    x_col: str = "x",
    lag_max: int | None = None,
) -> DataFrame:
    """CCF() — per-key cross-correlation, lags -L..L (acf.R:184-221)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        pdf = pdf.sort_values(order_col, kind="mergesort")
        y = pdf[y_col].to_numpy(dtype=np.float64)
        x = pdf[x_col].to_numpy(dtype=np.float64)
        lags, vals = ccf_r(y, x, lag_max=lag_max)
        return pd.DataFrame({key_col: key, "lag": lags.astype(np.int32), "ccf": vals})

    schema = f"{key_col} {df.schema[key_col].dataType.simpleString()}, lag int, ccf double"
    return df.groupBy(key_col).applyInPandas(fn, schema=schema)


def num_obs(df: DataFrame, key_col: str = "series_key") -> DataFrame:
    """build_cf's per-key length sidecar (acf.R:236-240)."""
    return df.groupBy(key_col).count().withColumnRenamed("count", "num_obs")
