"""Distinct-count tier rollups: exact per-bucket, and HLL-sketch cascade.

COUNT(DISTINCT x) is the one core aggregate that does NOT cascade:
1h distincts cannot be summed from 1m distincts (the same user active in
two minutes would double-count). At 10^12 rows the choices are:

  - exact per-bucket straight from raw (`distinct_rollup`): Spark plans
    `count(distinct)` as a two-stage expand/aggregate — exact, but every
    tier re-scans raw data, so it is the small-tier / final-report path;
  - mergeable sketches (`hll_distinct_tiers`): Apache DataSketches HLL
    via the built-in `hll_sketch_agg` / `hll_union_agg` (JVM-side,
    no Python). Sketch once per 1m bucket, then every higher tier is a
    union of CHILD-TIER sketches — the raw table is scanned exactly once
    and each cascade level shuffles only ~(buckets × 2^lgK bytes). Union
    is associative and deterministic (same input -> same merged sketch),
    so cascading is reproducible; the merged estimate can differ from a
    direct-from-raw sketch by a hair (the union operator keeps a wider
    HLL_8 register array than the HLL_4 a fresh sketch compacts to), but
    both sit inside the same ~1.04/sqrt(2^lgK) relative error envelope —
    the re-aggregation contract rollup_raw gives for sum/min/max,
    restored for distinct at sketch precision.

No feasts analogue (reference is per-series features only); this is the
"active users per tier" continuous aggregate every rollup engine ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .rollup import TIERS


def distinct_rollup(
    df: DataFrame,
    tier: str,
    item_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Exact distinct `item_col` per time bucket (site-wide, no series key).

    Output: bucket_ts, n_points, n_distinct. One expand-based aggregate;
    exact, but does not cascade — use hll_distinct_tiers for the
    scan-once multi-tier path.
    """
    trunc = TIERS[tier]
    return (
        df.groupBy(F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count_distinct(F.col(item_col)).alias("n_distinct"),
        )
    )


def hll_distinct_tiers(
    df: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    lgk: int = 12,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
) -> DataFrame:
    """HLL distinct-count estimates at every tier from ONE raw scan.

    Sketches (lgConfigK=`lgk`) are built per 1m bucket, then each higher
    tier merges the previous tier's sketches with `hll_union_agg` —
    never re-reading raw data. Returns the tier-tagged union:
    (tier string, bucket_ts, n_est bigint). Estimates are rounded to
    bigint (DataSketches returns the exact integer estimate as double).
    """
    if tiers[0] != "1m" or list(tiers) != ["1m", "1h", "1d"][: len(tiers)]:
        raise ValueError(f"tiers must be a prefix of ('1m','1h','1d'): {tiers}")
    base = (
        df.groupBy(F.date_trunc("minute", F.col(ts_col)).alias("bucket_ts"))
        .agg(F.hll_sketch_agg(F.col(item_col), F.lit(lgk)).alias("_sk"))
    )
    out_levels = {"1m": base}
    for child, parent, trunc in (("1m", "1h", "hour"), ("1h", "1d", "day")):
        if parent not in tiers:
            break
        out_levels[parent] = (
            out_levels[child]
            .groupBy(F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts"))
            .agg(F.hll_union_agg(F.col("_sk")).alias("_sk"))
        )
    parts = [
        lvl.select(
            F.lit(t).alias("tier"),
            "bucket_ts",
            F.round(F.hll_sketch_estimate(F.col("_sk"))).cast("long").alias("n_est"),
        )
        for t, lvl in out_levels.items()
        if t in tiers
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
