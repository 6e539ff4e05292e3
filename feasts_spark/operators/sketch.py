"""Mergeable histogram sketches for the rollup tiers — approximate
quantiles that RE-AGGREGATE across tiers like sum/min/max do.

Spark's approx_percentile cannot be merged across pre-aggregated tiers,
so a 1d-quantile query would have to rescan raw points. Instead each
(key, bucket) carries a fixed-grid histogram (array<long> of bin counts
over a declared [lo, hi) range): binning is a pure projection
(whole-stage codegen), and a HIGHER tier's histogram is the element-wise
SUM of its children's arrays — the same cascade contract as the numeric
rollup columns, so 1h composes from 1m and 1d from 1h without touching
raw data. Quantiles come from cumulative bin counts with linear
interpolation inside the target bin.

Everything is deterministic integer/float arithmetic, so the DuckDB
oracle reproduces the sketch EXACTLY (no tolerance): bin = clamped
floor((x-lo)/width) is identical in both engines.

Accuracy is the grid resolution: error <= bin width on values inside
[lo, hi); outliers clamp to the edge bins (counts stay exact, positions
saturate) — the usual fixed-range histogram contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from feasts_spark.operators.rollup import TIERS


def _bin_expr(value_col: str, lo: float, hi: float, n_bins: int):
    """Clamped bin index: floor((x - lo) / width), saturating at the edges."""
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def _merge_arrays(n_bins: int):
    """Aggregate expression: element-wise sum of collected hist arrays."""
    return F.aggregate(
        F.collect_list("_v"),
        F.expr(f"array_repeat(CAST(0 AS BIGINT), {n_bins})"),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )


def hist_rollup(
    df: DataFrame,
    tier: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One histogram per (key, bucket): (key, bucket_ts, n_points, hist).

    Plan: project bin index -> groupBy(key, bucket, bin) count -> scatter
    each (bin, count) into a zero vector and element-wise-sum per
    (key, bucket). Two narrow aggregations, both map-side combining; no
    Python anywhere.
    """
    trunc = TIERS[tier]
    bucket = F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts")
    binned = df.select(
        F.col(key_col).alias("series_key"), bucket,
        _bin_expr(value_col, lo, hi, n_bins).alias("bin"),
    )
    per_bin = binned.groupBy("series_key", "bucket_ts", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    scatter = F.expr(
        f"transform(sequence(0, {n_bins - 1}), "
        "i -> CASE WHEN i = bin THEN c ELSE CAST(0 AS BIGINT) END)"
    )
    return (
        per_bin.withColumn("_v", scatter)
        .groupBy("series_key", "bucket_ts")
        .agg(F.sum("c").alias("n_points"), _merge_arrays(n_bins).alias("hist"))
    )


def hist_cascade(hist_df: DataFrame, tier: str, n_bins: int = 64) -> DataFrame:
    """Merge a finer tier's histograms up to `tier` — array sums only,
    never touching raw data (same cascade contract as rollup_cascade)."""
    trunc = TIERS[tier]
    return (
        hist_df.withColumn("_v", F.col("hist"))
        .groupBy(
            "series_key",
            F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"),
        )
        .agg(F.sum("n_points").alias("n_points"), _merge_arrays(n_bins).alias("hist"))
    )


def hist_quantile(
    hist_df: DataFrame, q: float, lo: float, hi: float, out_col: str | None = None
) -> DataFrame:
    """Estimate the q-quantile per histogram row.

    rank = ceil(q * n); target bin b = #bins whose cumulative count is
    below rank (0-based); the estimate interpolates linearly inside the
    bin: lo + width * (b + (rank - cum_before) / in_bin). Pure array SQL,
    exactly reproducible in the oracle.

    The estimate targets the ORDER STATISTIC x_(ceil(q*n)) ("lower"
    interpolation), accurate to one bin width for values inside
    [lo, hi) — midpoint-interpolating medians (R type 7 / pandas
    default) can sit between two distant order statistics and are not
    bounded by any histogram's resolution.
    """
    out_col = out_col or f"q{int(q * 100)}"
    width = f"(CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) / size(hist)"
    rank = f"CAST(ceil(CAST({q} AS DOUBLE) * n_points) AS BIGINT)"
    b = f"size(filter(cum_hist, c -> c < {rank}))"
    cum_before = (
        f"element_at(concat(array(CAST(0 AS BIGINT)), cum_hist), {b} + 1)"
    )
    in_bin = f"(element_at(cum_hist, {b} + 1) - {cum_before})"
    qexpr = f"""
      CAST({lo} AS DOUBLE) + {width} * (
        CAST({b} AS DOUBLE)
        + (CAST({rank} AS DOUBLE) - CAST({cum_before} AS DOUBLE))
          / CAST(greatest({in_bin}, CAST(1 AS BIGINT)) AS DOUBLE)
      )
    """
    with_cum = hist_df.withColumn(
        "cum_hist",
        F.expr(
            "slice(aggregate(hist, array(CAST(0 AS BIGINT)), "
            "(acc, c) -> concat(acc, array(element_at(acc, -1) + c))), "
            "2, size(hist))"
        ),
    )
    return with_cum.withColumn(out_col, F.expr(qexpr)).drop("cum_hist")
