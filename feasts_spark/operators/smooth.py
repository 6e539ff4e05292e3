"""Exponential smoothing over tier points (EWMA) + calendar profiles.

feasts' smoothing lives inside STL/supsmu; production rollup engines also
want the cheap streaming-friendly smoother: the exponentially weighted
moving average  y_t = alpha * x_t + (1 - alpha) * y_{t-1},  y_0 = x_0
(the `adjust=False` recursion — each point's weight decays geometrically,
the same recurrence a streaming job maintains as one float of state).

Spark shape: the recursion is inherently sequential per series, so this
is the feature-pack pattern — ONE shuffle on the key, then a vectorized
kernel per group. The kernel uses a log-domain prefix-scan trick to stay
fully vectorized: with b = 1-alpha,

    y_t = b^t * x_0 + alpha * sum_{i=1..t} b^(t-i) x_i
        = b^t * (x_0 + alpha * cumsum(x_i / b^i))

b^-i overflows double for long series (b=0.7 -> ~10^155 at i=1000), so
the kernel rescales in blocks of 256 points: within a block the exponent
range is bounded (b^-256 ~ 10^39 at alpha=0.3, fine in float64), and the
block boundary carries y forward as the new "x_0". Exact same recursion
result to ULP, no Python loop over points (only over blocks).

calendar_profile: per-series seasonal fingerprints by hour-of-day and
day-of-week — the grouped-aggregate twin of feasts' seasonal-strength
features, trivially decomposable (one shuffle, map-side combine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_BLOCK = 256


def ewma_kernel(x: np.ndarray, alpha: float) -> np.ndarray:
    """Vectorized adjust=False EWMA (see module docstring for the block-
    rescaled prefix-scan derivation).

    The block length adapts to alpha: b^-block is capped at ~1e100 so
    neither b^block underflows nor x/b^i overflows for |x| up to ~1e200
    — a fixed 256-point block would underflow b^256 to 0.0 for
    alpha >= ~0.946 and emit silent NaNs."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    n = x.size
    if n == 0:
        return x
    if alpha == 1.0:  # b = 0: y_t = x_t, and b**p below would divide by 0
        return x.astype(np.float64, copy=True)
    b = 1.0 - alpha
    block = _BLOCK if b >= 0.99 else max(
        1, min(_BLOCK, int(230.0 / -np.log(b)))
    )
    out = np.empty(n, dtype=np.float64)
    y0 = x[0]
    out[0] = y0
    pos = 1
    while pos < n:
        blk = x[pos : pos + block]
        m = blk.size
        # exponents 1..m within the block, relative to y0 at exponent 0
        p = np.arange(1, m + 1, dtype=np.float64)
        bp = b**p  # b^1 .. b^m
        # y_{pos-1+j} = b^j*y0 + alpha * b^j * cumsum(x_i / b^i)
        out[pos : pos + m] = bp * (y0 + alpha * np.cumsum(blk / bp))
        y0 = out[pos + m - 1]
        pos += m
    return out


def ewma(
    df: DataFrame,
    alpha: float,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> DataFrame:
    """Per-row EWMA of `value_col` in `order_col` order within each key.

    Output: (key, order_col, value_col, ewma).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        out = pdf[[key_col, order_col, value_col]].copy()
        out["ewma"] = ewma_kernel(x, alpha)
        return out

    key_type = df.schema[key_col].dataType.simpleString()
    ord_type = df.schema[order_col].dataType.simpleString()
    schema = (
        f"{key_col} {key_type}, {order_col} {ord_type}, "
        f"{value_col} double, ewma double"
    )
    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(fn, schema=schema)
    )


def calendar_profile(
    df: DataFrame,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Seasonal fingerprint per key: mean/stddev/count of the value by
    hour-of-day (dim='hod', idx 0-23) and day-of-week (dim='dow', idx 1-7,
    1=Sunday per Spark/DuckDB dayofweek).

    Output: series_key, dim, idx, n_points, val_avg, val_std.
    One union of two partial/final aggregates — both shuffle on the same
    (key, small-int) space; at scale this is two cheap map-combined aggs
    over one scan (Spark reuses the scan via the shared source).
    """
    def agg_by(dim: str, idx_col):
        return (
            df.groupBy(
                F.col(key_col).alias("series_key"),
                F.lit(dim).alias("dim"),
                idx_col.cast("int").alias("idx"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_points"),
                F.avg(value_col).alias("val_avg"),
                F.stddev_samp(value_col).alias("val_std"),
            )
        )

    t = F.col(ts_col)
    return agg_by("hod", F.hour(t)).unionByName(
        agg_by("dow", F.dayofweek(t))
    )
