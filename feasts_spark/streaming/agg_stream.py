"""Streaming twins of the top-k and distinct-count continuous aggregates.

A continuous-aggregate engine maintains its tier tables incrementally;
these queries keep the new round-3 aggregates (operators/topk.py,
operators/distinct.py) correct under streaming arrival with late data:

  - `stream_item_counts`: watermarked per-(key, window, item) counts in
    append mode — the streaming half of exact top-k. Ranking is a plain
    window over the CLOSED count rows (`finalize_topk`), because rank is
    not a streaming-safe aggregate (a late row inside the watermark can
    reorder items, so ranks may only be assigned once the window
    finalizes). Split-emit/rank is exactly how the batch operator
    composes too: count agg, then rank over aggregate-sized rows.
  - `stream_distinct_counts`: exact distinct items per window via
    watermarked `dropDuplicates` on (window, item) before a windowed
    count — the same expand-free two-step the batch planner uses, with
    duplicate suppression state bounded by the watermark.

Both emit bit-identical rows to their batch twins on bounded input
(tests/test_streaming.py) — the stream==batch contract every other
streaming operator in this package carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .rollup_stream import _TIER_DURATION


def stream_item_counts(
    stream: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "ts",
    item_col: str = "item",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked per-(key, bucket, item) counts, append on window close."""
    win = F.window(F.col(ts_col), _TIER_DURATION[tier])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).alias("series_key"), win.alias("w"),
            F.col(item_col).alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("series_key", F.col("w.start").alias("bucket_ts"),
                "item", "cnt")
    )


def finalize_topk(counts: DataFrame, k: int) -> DataFrame:
    """Rank closed count rows to top-k per (key, bucket) — the SAME rank
    stage as the batch operator (operators.topk.rank_topk), so the
    deterministic (cnt DESC, item ASC) tie contract cannot drift."""
    from ..operators.topk import rank_topk

    return rank_topk(counts, k, ["series_key", "bucket_ts"], "item")


def stream_distinct_counts(
    stream: DataFrame,
    tier: str,
    ts_col: str = "ts",
    item_col: str = "item",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact distinct `item_col` per window: dedupe within the watermark,
    then a windowed count — append on window close."""
    win = F.window(F.col(ts_col), _TIER_DURATION[tier])
    deduped = (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), win.alias("w"), F.col(item_col).alias("item"))
        .dropDuplicates(["w", "item"])
    )
    return (
        deduped.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(F.col("w.start").alias("bucket_ts"), "n_distinct")
    )
