"""Visual/archival downsampling: LTTB and M4.

Steinarsson (2013): keep the first and last points; split the interior
into n_out-2 buckets; from each bucket keep the point forming the
largest triangle with the previously kept point and the NEXT bucket's
average. The standard downsample for plotting/preview tiers — preserves
extrema and shape far better than striding or averaging.

Spark shape: one applyInPandas per series (same single-shuffle pattern as
the feature pack), numpy-vectorized kernel inside — per-bucket triangle
areas are computed with array ops; the only Python loop is over the
n_out-2 buckets (not over points), because each selection depends on the
previously selected point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def lttb_kernel(ts: np.ndarray, vals: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the selected points (sorted), |result| == min(n_out, n)."""
    n = ts.size
    if n_out >= n or n_out < 3:
        return np.arange(n) if n_out >= n else np.array([0, n - 1])[: max(n, 0)]
    # bucket boundaries over the interior points 1..n-2
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    t = ts.astype(np.float64)
    keep = np.empty(n_out, dtype=np.int64)
    keep[0] = 0
    keep[-1] = n - 1
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < edges.size else n)
        # average of the NEXT bucket (last "bucket" is the final point)
        avg_t = t[nlo:nhi].mean() if nhi > nlo else t[n - 1]
        avg_v = vals[nlo:nhi].mean() if nhi > nlo else vals[n - 1]
        # triangle area vs (prev point, candidate, next-bucket average)
        area = np.abs(
            (t[prev] - avg_t) * (vals[lo:hi] - vals[prev])
            - (t[prev] - t[lo:hi]) * (avg_v - vals[prev])
        )
        prev = lo + int(np.argmax(area))
        keep[b + 1] = prev
    return keep


def lttb_downsample(
    df: DataFrame,
    n_out: int,
    key_col: str = "series_key",
    ts_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> DataFrame:
    """Per-series LTTB to at most n_out points: (key, ts, value, orig_n)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = pdf[ts_col].astype("int64").to_numpy()
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        idx = lttb_kernel(ts, vals, n_out)
        out = pdf.iloc[idx][[key_col, ts_col, value_col]].copy()
        out["orig_n"] = len(pdf)
        return out

    key_type = df.schema[key_col].dataType.simpleString()
    schema = (
        f"{key_col} {key_type}, {ts_col} timestamp, {value_col} double, "
        "orig_n long"
    )
    return (
        df.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(fn, schema=schema)
    )


def m4_downsample(
    df: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str | None = None,
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (key, time bucket)
    keep the four pixel-defining points — first, last, min, max — as a
    wide row with each point's value AND timestamp.

    Unlike LTTB (sequential selection, needs applyInPandas), M4 is a pure
    decomposable aggregate: every output column is a lexicographic
    struct-min/max, so Spark runs it as a partial/final hash aggregate
    with map-side combine — ONE shuffle on (key, bucket), zero Python,
    and it re-aggregates exactly (1h M4 composes from 1m M4), the same
    cascade contract as rollup_raw. Ties on value/timestamp are broken by
    `tie_col` (e.g. an event id), making the selection deterministic on
    both engines — the DuckDB oracle uses the identical struct-min trick.

    Output: series_key, bucket_ts, n_points,
            first_ts, first_val, last_ts, last_val,
            min_val, min_ts, max_val, max_ts.
    """
    from pyspark.sql import functions as F

    from .rollup import TIERS

    trunc = TIERS[tier]
    tie = F.col(tie_col) if tie_col is not None else F.lit(0)
    t, v = F.col(ts_col), F.col(value_col)
    by_ts = F.struct(t.alias("t"), tie.alias("e"), v.alias("v"))
    by_val = F.struct(v.alias("v"), t.alias("t"), tie.alias("e"))
    return (
        df.groupBy(
            F.col(key_col).alias("series_key"),
            F.date_trunc(trunc, t).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(by_ts).alias("_first"),
            F.max(by_ts).alias("_last"),
            F.min(by_val).alias("_min"),
            F.max(by_val).alias("_max"),
        )
        .select(
            "series_key", "bucket_ts", "n_points",
            F.col("_first.t").alias("first_ts"),
            F.col("_first.v").alias("first_val"),
            F.col("_last.t").alias("last_ts"),
            F.col("_last.v").alias("last_val"),
            F.col("_min.v").alias("min_val"),
            F.col("_min.t").alias("min_ts"),
            F.col("_max.v").alias("max_val"),
            F.col("_max.t").alias("max_ts"),
        )
    )
