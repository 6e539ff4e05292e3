"""Structured Streaming tier rollup — the streaming twin of operators.rollup.

The batch engine treats "streaming" as checkpointed incremental batch
(SURVEY.md §7, matching the reference's batch nature), but the same tier
aggregates are also expressible as a genuine Structured Streaming query:
watermarked event-time windows with append output, so late transcript turns
inside the watermark still land in their bucket and buckets finalize
exactly once. The aggregate set matches rollup_raw (decomposable), so a
streaming 1m tier can be cascaded by the batch path afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_TIER_DURATION = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def stream_rollup(
    stream: DataFrame,
    tier: str,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming continuous aggregate: one row per (key, bucket) on close.

    min_by/max_by are not supported in streaming aggregations, so first/last
    are recovered from (ts, value) struct min/max — equivalent because the
    struct orders by ts first.
    """
    v = F.col(value_col)
    win = F.window(F.col(ts_col), _TIER_DURATION[tier])
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).alias("series_key"), win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(v).alias("val_sum"),
            F.min(v).alias("val_min"),
            F.max(v).alias("val_max"),
            F.min(F.struct(F.col(ts_col), v)).alias("_first"),
            F.max(F.struct(F.col(ts_col), v)).alias("_last"),
        )
    )
    return agg.select(
        "series_key",
        F.col("w.start").alias("bucket_ts"),
        "n_points",
        "val_sum",
        "val_min",
        "val_max",
        F.col(f"_first.{value_col}").alias("val_first"),
        F.col(f"_last.{value_col}").alias("val_last"),
        F.col(f"_first.{ts_col}").alias("first_ts"),
        F.col(f"_last.{ts_col}").alias("last_ts"),
        (F.col("val_sum") / F.col("n_points")).alias("val_avg"),
    )


def run_stream_once(
    spark: SparkSession,
    input_path: str,
    schema: str,
    tier: str,
    query_name: str = "rollup_stream",
    **kwargs,
) -> DataFrame:
    """Drive a parquet-directory-backed stream to completion (availableNow)
    into a memory sink; returns the finalized rows as a batch DataFrame.

    With append output mode only watermark-closed windows emit — callers
    append a max-timestamp sentinel row or read the complete output for
    bounded fixtures (tests use complete mode via this helper's sink)."""
    import os
    import shutil
    import tempfile

    # FileStreamSource requires a directory basePath; stage a single-file
    # input behind a symlink dir (production inputs are table directories).
    # The link target must be absolute — a relative input_path would
    # resolve relative to the staged temp dir, i.e. a broken link and a
    # silently empty stream.
    staged = None
    if os.path.isfile(input_path):
        staged = tempfile.mkdtemp(prefix="feasts_stream_")
        os.symlink(
            os.path.abspath(input_path),
            os.path.join(staged, os.path.basename(input_path)),
        )
        input_path = staged
    try:
        stream = (
            spark.readStream.schema(schema).parquet(input_path)
        )
        rolled = stream_rollup(stream, tier, **kwargs)
        q = (
            rolled.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # materialize before the staged dir disappears
        out = spark.sql(f"SELECT * FROM {query_name}")
        out.count()
        return out
    finally:
        if staged is not None:
            shutil.rmtree(staged, ignore_errors=True)
