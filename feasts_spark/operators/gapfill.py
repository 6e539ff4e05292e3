"""Gap-fill operators: dense grid + LOCF + linear interpolation.

The reference only *detects* gaps and aborts (dcmp_checks.R:1-5,
has_gaps); tsibble::fill_gaps is the companion op users run first. Here
gap-fill is a first-class engine stage because the rollup tiers must be
regular before feature extraction (SURVEY.md §2.4 "gap-fill step makes the
regular grid explicit").

Scale notes:
  - The dense grid is generated per key with `sequence()` + `explode` —
    no driver-side loop, no cross join. Grid size is bounded by each key's
    own [min, max] span.
  - The join grid<-left-join->data is on (key, bucket): both sides hash
    partition on the same key, and AQE handles the usual grid>>data
    imbalance. No broadcast needed: the grid is NOT small at scale.
  - LOCF / interpolation are pure window functions (whole-stage codegen,
    no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from feasts_spark.operators.rollup import TIER_SECONDS


def dense_grid(
    df: DataFrame,
    tier: str,
    key_col: str = "series_key",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """One row per (key, bucket) over each key's [min, max] bucket span."""
    step = F.expr(f"INTERVAL {TIER_SECONDS[tier]} SECONDS")
    return (
        df.groupBy(key_col)
        .agg(F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("_b0"), F.col("_b1"), step)).alias(bucket_col),
        )
    )


def gapfill_locf(
    df: DataFrame,
    tier: str,
    key_col: str = "series_key",
    bucket_col: str = "bucket_ts",
    value_cols: tuple[str, ...] = ("val_avg",),
) -> DataFrame:
    """Dense grid + last-observation-carried-forward.

    Output: key, bucket, <value>_filled per value col, plus `is_gap`.
    """
    grid = dense_grid(df, tier, key_col, bucket_col)
    joined = grid.join(df, on=[key_col, bucket_col], how="left")
    w = (
        W.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = joined.withColumn(
        "is_gap", F.col(value_cols[0]).isNull()
    )
    for c in value_cols:
        out = out.withColumn(f"{c}_filled", F.last(F.col(c), ignorenulls=True).over(w))
    return out


def gapfill_linear(
    df: DataFrame,
    tier: str,
    key_col: str = "series_key",
    bucket_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> DataFrame:
    """Dense grid + linear interpolation between surrounding observations.

    Leading/trailing gaps (no observation on one side) fall back to the
    available side (i.e. locf / nocb at the edges).
    """
    grid = dense_grid(df, tier, key_col, bucket_col)
    joined = grid.join(df, on=[key_col, bucket_col], how="left")
    wb = (
        W.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col(bucket_col))
    prev_v = F.last(v, ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    prev_t = F.last(obs_ts, ignorenulls=True).over(wb)
    next_t = F.first(obs_ts, ignorenulls=True).over(wf)
    t = F.col(bucket_col).cast("double")
    pt = prev_t.cast("double")
    nt = next_t.cast("double")
    frac = (t - pt) / (nt - pt)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return (
        joined.withColumn("is_gap", v.isNull())
        .withColumn(f"{value_col}_interp", interp)
    )
