"""Generic per-series scalar-statistics operator.

The reference computes every feature as fn(numeric vector) -> named scalars
(features.R, tests.R, guerrero.R). This operator is the single Spark
pattern behind all of them: one shuffle on the series key, Arrow-batched
`applyInPandas`, a numpy kernel per group, a STATIC output schema declared
up front (SURVEY.md §1.3 — variable-presence columns are always emitted).

Used by __spark_entry__ for the portmanteau / guerrero / unit-root /
intermittency queries; the wide feature pack (operators.features) is the
same pattern with many kernels fused into one UDF.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def series_stats(
    df: DataFrame,
    kernel: Callable[..., dict],
    out_cols: list[str],
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
    min_points: int = 0,
    **kwargs,
) -> DataFrame:
    """One output row per key: (key, *out_cols) = kernel(ordered values).

    kernel receives the float64 series in `order_col` order and must return
    a dict; missing/NaN entries are emitted as nulls (double). Series
    shorter than `min_points` are dropped inside the group — equivalent
    to an upstream count semi-join without its extra shuffles.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < min_points:
            return pd.DataFrame({c: [] for c in [key_col] + list(out_cols)})
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        try:
            res = kernel(x, **kwargs)
        except Exception:
            res = {}
        row = {key_col: pdf[key_col].iloc[0]}
        for c in out_cols:
            v = res.get(c)
            row[c] = float(v) if v is not None else None
        return pd.DataFrame([row])

    key_type = df.schema[key_col].dataType.simpleString()
    schema = ", ".join([f"{key_col} {key_type}"] + [f"{c} double" for c in out_cols])
    return df.groupBy(key_col).applyInPandas(fn, schema=schema)
