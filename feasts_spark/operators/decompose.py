"""Decomposition operators: STL components and classical decomposition.

STL (reference stl.R:88-129) is inherently per-series iterative loess ->
Arrow-batched applyInPandas over the R-exact numpy kernel.

Classical decomposition (reference classical.R:13-53 delegating to
stats::decompose) is expressible in PURE Spark SQL — centered moving
averages and cycle-position means are window/group aggregates — so two
implementations exist:
  - classical_decomposition(): SQL-native (whole-stage codegen, no Python;
    the scale path), and
  - classical kernel inside the UDF tests as the oracle-exact cross-check.

fitted/residuals (stl.R:132-140) are trivial column arithmetic on the
output and provided as helpers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from feasts_spark.kernels.stl import estimate_stl


def stl_components(
    df: DataFrame,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
    periods: tuple[int, ...] = (),
    s_windows: tuple | None = None,
    iterations: int = 2,
) -> DataFrame:
    """model(STL(value ~ season(p)...)) %>% components() — row-aligned.

    Output columns: key, order, value, trend, season_<p>..., remainder,
    season_adjust. Alias invariants (value = trend + sum(seasons) +
    remainder; season_adjust = trend + remainder) hold exactly and are
    asserted in tests.
    """
    periods = tuple(int(p) for p in periods)
    season_cols = [f"season_{p}" for p in periods if p > 1]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=np.float64)
        dcmp = estimate_stl(
            y,
            periods=periods,
            s_windows=list(s_windows) if s_windows else None,
            iterations=iterations,
        )
        out = pdf[[key_col, order_col, value_col]].copy()
        out["trend"] = dcmp["trend"]
        for c in season_cols:
            out[c] = dcmp[c]
        out["remainder"] = dcmp["remainder"]
        out["season_adjust"] = dcmp["season_adjust"]
        return out

    key_type = df.schema[key_col].dataType.simpleString()
    order_type = df.schema[order_col].dataType.simpleString()
    schema = ", ".join(
        [f"{key_col} {key_type}", f"{order_col} {order_type}", f"{value_col} double",
         "trend double"]
        + [f"{c} double" for c in season_cols]
        + ["remainder double", "season_adjust double"]
    )
    return df.groupBy(key_col).applyInPandas(fn, schema=schema)


def reconstruction_ok(total_col: str, part_cols: list[str], tol: float = 1e-9):
    """Boolean column asserting the STL reconstruction identity
    |total - sum(parts)| < tol on each row (value = trend + Σseason +
    remainder; season_adjust = trend + remainder — stl.R:108-112).

    Intended as an IN-PLAN invariant certificate: wrap the emitted value
    in ``F.when(reconstruction_ok(...), value).otherwise(F.raise_error(...))``
    so any corrupted component makes the query THROW at execution time
    instead of silently returning rows. Must be evaluated on UNROUNDED
    components — display rounding destroys the identity at tol=1e-9."""
    resid = F.col(total_col)
    for p in part_cols:
        resid = resid - F.col(p)
    return F.abs(resid) < tol


def stl_fitted(components: DataFrame, value_col: str = "val_avg") -> DataFrame:
    """fitted() = value - remainder (stl.R:132-134)."""
    return components.withColumn("fitted", F.col(value_col) - F.col("remainder"))


def stl_residuals(components: DataFrame) -> DataFrame:
    """residuals() = remainder (stl.R:138-140)."""
    return components.withColumn("residuals", F.col("remainder"))


def classical_decomposition(
    df: DataFrame,
    period: int,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
    type: str = "additive",
) -> DataFrame:
    """stats::decompose, Spark-SQL-native (classical.R:13-53 semantics).

    trend   = centered MA(period); even periods use the half-weighted
              (1/2, 1, ..., 1, 1/2)/period filter => NULL at each end.
    figure  = mean of detrended per cycle position, centered (additive:
              subtract mean of figure; multiplicative: divide).
    seasonal= figure tiled; random = detrended vs seasonal;
    season_adjust = value (-|/) seasonal.

    Everything stays in whole-stage codegen: two window passes + one
    group-join. The per-key row_number gives the cycle position, matching
    ts(y, frequency=m) starting at phase 0.
    """
    if type not in ("additive", "multiplicative"):
        raise ValueError(type)
    m = int(period)
    wk = W.partitionBy(key_col).orderBy(order_col)
    v = F.col(value_col)
    df = df.withColumn("_rn", F.row_number().over(wk) - F.lit(1))
    half = m // 2
    if m % 2 == 0:
        # weights (0.5, 1 x (m-1), 0.5)/m over rows [-m/2, m/2]
        wma = wk.rowsBetween(-half, half)
        n_in = F.count(v).over(wma)
        s_all = F.sum(v).over(wma)
        first_v = F.first(v).over(wma)
        last_v = F.last(v).over(wma)
        trend = (s_all - 0.5 * first_v - 0.5 * last_v) / m
        trend = F.when(n_in == m + 1, trend)  # NULL where window incomplete
    else:
        wma = wk.rowsBetween(-half, half)
        n_in = F.count(v).over(wma)
        trend = F.when(n_in == m, F.avg(v).over(wma))
    df = df.withColumn("trend", trend)
    detrend = (v - F.col("trend")) if type == "additive" else (v / F.col("trend"))
    df = df.withColumn("_detrend", detrend).withColumn("_pos", F.col("_rn") % m)
    figure = (
        df.groupBy(key_col, "_pos")
        .agg(F.avg("_detrend").alias("_fig_raw"))
    )
    wfig = W.partitionBy(key_col)
    if type == "additive":
        figure = figure.withColumn(
            "_figure", F.col("_fig_raw") - F.avg("_fig_raw").over(wfig)
        )
    else:
        figure = figure.withColumn(
            "_figure", F.col("_fig_raw") / F.avg("_fig_raw").over(wfig)
        )
    out = df.join(figure.select(key_col, "_pos", "_figure"), [key_col, "_pos"])
    seasonal = F.col("_figure")
    if type == "additive":
        random = v - F.col("trend") - seasonal
        sadj = v - seasonal
    else:
        random = v / (F.col("trend") * seasonal)
        sadj = v / seasonal
    return (
        out.withColumn("seasonal", seasonal)
        .withColumn("random", random)
        .withColumn("season_adjust", sadj)
        .select(key_col, order_col, value_col, "trend", "seasonal", "random",
                "season_adjust")
    )


def classical_decompose_kernel(y: np.ndarray, m: int, type: str = "additive") -> dict:
    """Reference-exact numpy stats::decompose — the oracle for the SQL op."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    trend = np.full(n, np.nan)
    half = m // 2
    if m % 2 == 0:
        w = np.full(m + 1, 1.0 / m)
        w[0] = w[-1] = 0.5 / m
        for i in range(half, n - half):
            trend[i] = float(w @ y[i - half : i + half + 1])
    else:
        for i in range(half, n - half):
            trend[i] = float(np.mean(y[i - half : i + half + 1]))
    detrend = y - trend if type == "additive" else y / trend
    figure = np.array([
        np.nanmean(detrend[pos::m]) for pos in range(m)
    ])
    figure = figure - figure.mean() if type == "additive" else figure / figure.mean()
    seasonal = figure[np.arange(n) % m]
    if type == "additive":
        random = y - trend - seasonal
        sadj = y - seasonal
    else:
        random = y / (trend * seasonal)
        sadj = y / seasonal
    return {"trend": trend, "seasonal": seasonal, "random": random,
            "season_adjust": sadj, "figure": figure}
