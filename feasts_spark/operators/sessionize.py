"""Gap-based sessionization — split each key's event stream into sessions
wherever the inter-event gap exceeds a threshold.

Classic time-series-engine verb (and the natural "conversation episode"
splitter for transcript streams): a new session starts when
ts - lag(ts) > gap. Pure window SQL — lag + conditional flag + running
sum — all whole-stage codegen, one shuffle on the key. The per-session
summary is one further aggregate on (key, session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _epoch(c):
    """Epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ cannot
    cast straight to long in Spark 4; via TIMESTAMP it is interpreted in
    the session timezone — UTC in this engine — matching DuckDB epoch())."""
    return c.cast("timestamp").cast("long")


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: list | None = None,
) -> DataFrame:
    """Adds `session_id` (0-based per key, in time order).

    A row opens a new session iff it is the key's first row or its gap to
    the previous row is strictly greater than `gap_seconds`.
    """
    order_cols = order_cols or [ts_col]
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    prev_ts = F.lag(ts_col).over(wo)
    is_new = F.when(
        prev_ts.isNull()
        | (_epoch(F.col(ts_col)) - _epoch(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        (F.sum(is_new).over(wo.rowsBetween(W.unboundedPreceding, 0)) - 1).cast(
            "long"
        ),
    )


def session_stats(
    df: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    order_cols: list | None = None,
) -> DataFrame:
    """One row per (key, session): bounds, length, duration, value sum."""
    s = sessionize(df, gap_seconds, key_col, ts_col, order_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(_epoch(F.col(ts_col))) - F.min(_epoch(F.col(ts_col))))
        .alias("duration_s"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("val_sum"))
    return s.groupBy(
        F.col(key_col).alias("series_key"), "session_id"
    ).agg(*aggs)
