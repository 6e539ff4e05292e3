"""Interval analytics: gaps-and-islands episodes + bucketed interval join.

No feasts analogue (reference is per-series features); this is the
rollup-engine surface for "sustained activity windows" (TimescaleDB
state_agg / heartbeat_agg territory).

Scale design:
  - `activity_episodes` runs entirely on TIER-ROLLUP rows (one row per
    (series, bucket)), never raw points — at 10^12 raw turns the input
    is already ~10^4× smaller. The islands trick (bucket_index minus
    row_number is constant within a consecutive run) needs one window
    sort per series and one aggregate: two exchanges on rollup-sized
    data.
  - `interval_join` is the bucketed-expansion equi-join rewrite of a
    range join: Spark has no native ASOF/range join, and the naive
    `probe.ts BETWEEN i.start AND i.end` theta-join degenerates to a
    per-key nested loop (BroadcastNestedLoopJoin at cluster scale — a
    non-starter). Instead each interval is exploded into the time
    buckets it covers via `sequence()`, the join becomes a plain hash
    equi-join on (key, bucket), and a residual BETWEEN filter removes
    the partial-bucket edges. Expansion factor = interval_len / bucket:
    pick the bucket near the median interval length so the blow-up is
    O(1) per interval. The DuckDB oracle runs the naive range join, so
    the rewrite is verified equivalent engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .rollup import TIER_SECONDS, TIERS


def activity_episodes(
    rolled: DataFrame,
    tier: str,
    min_points: int,
    key_col: str = "series_key",
    bucket_col: str = "bucket_ts",
    points_col: str = "n_points",
) -> DataFrame:
    """Maximal runs of consecutive `tier` buckets with >= min_points each.

    Input: tier-rollup rows (one per key x bucket). Output one row per
    episode: series_key, episode_start (first bucket), episode_end
    (EXCLUSIVE: last bucket + tier), n_buckets, total_points.
    """
    step = TIER_SECONDS[tier]
    active = rolled.filter(F.col(points_col) >= min_points)
    w = Window.partitionBy(key_col).orderBy(bucket_col)
    # bucket index minus dense position is constant across a gap-free run
    grp = (
        (F.unix_timestamp(F.col(bucket_col)) / step).cast("long")
        - F.row_number().over(w)
    ).alias("_grp")
    return (
        active.select(F.col(key_col).alias("series_key"), bucket_col,
                      points_col, grp)
        .groupBy("series_key", "_grp")
        .agg(
            F.min(bucket_col).alias("episode_start"),
            (F.max(bucket_col) + F.expr(f"INTERVAL {step} SECONDS")).alias(
                "episode_end"
            ),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(points_col).alias("total_points"),
        )
        .drop("_grp")
    )


def interval_join(
    probes: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str = "episode_start",
    end_col: str = "episode_end",
    tier: str = "1h",
    how: str = "inner",
    interval_key_col: str | None = None,
) -> DataFrame:
    """Join each probe row to every interval of the same key containing
    its timestamp (start inclusive, end exclusive) — as a hash equi-join.

    Each interval explodes into its covered `tier` buckets (sequence of
    date_trunc'd starts), probes compute their own bucket, the join runs
    on (key, bucket), and a residual range filter trims bucket edges.
    Overlapping intervals multi-match, same as a naive range join.
    `how='left'` keeps unmatched probes with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left': {how}")
    trunc = TIERS[tier]
    step = TIER_SECONDS[tier]
    ikey = interval_key_col or key_col
    iv_cols = [c for c in intervals.columns if c != ikey]
    # end is exclusive: a bucket whose start equals end is never covered,
    # so step back one tick — one MICROSECOND, the TimestampType precision,
    # so an end like 11:00:00.000400 still covers its 11:00 bucket — before
    # truncating. Guards for arbitrary interval tables (episodes never hit
    # them): empty intervals (end <= start) are dropped — a range join
    # matches nothing for them — and a sub-bucket interval starting ON a
    # bucket boundary would truncate its stepped-back end BELOW its start,
    # which sequence() rejects; clamping to the start bucket keeps the one
    # covered bucket.
    start_b = F.date_trunc(trunc, F.col(start_col))
    end_b = F.date_trunc(
        trunc, F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")
    )
    expanded = intervals.filter(F.col(end_col) > F.col(start_col)).select(
        F.col(ikey).alias("_ikey"),
        *iv_cols,
        F.explode(
            F.sequence(
                start_b,
                F.greatest(start_b, end_b),
                F.expr(f"INTERVAL {step} SECONDS"),
            )
        ).alias("_bucket"),
    )
    p = probes.withColumn("_bucket", F.date_trunc(trunc, F.col(ts_col)))
    cond = (
        (p[ts_col] >= expanded[start_col])
        & (p[ts_col] < expanded[end_col])
        & (p["_bucket"] == expanded["_bucket"])
        & (p[key_col] == expanded["_ikey"])
    )
    out = p.join(expanded, cond, how).drop("_ikey")
    return out.drop("_bucket")
