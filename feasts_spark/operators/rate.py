"""Counter-rate semantics: per-bucket increase with counter-reset
detection (the PromQL `increase()` / TimescaleDB counter_agg model).

Monitoring counters grow monotonically and occasionally reset to ~0 on
restart. The naive `max - min` per bucket undercounts across resets; the
correct per-bucket increase is

    sum over consecutive pairs of:  delta          if delta >= 0
                                    current value  if delta < 0   (reset)

where delta = v_t - v_{t-1} within the series. The first point of a
series contributes nothing (no prior sample).

Spark shape: one window pass (lag) partitioned by key + one partial/final
hash aggregate on (key, bucket) — the window and the groupBy share the
same key hash-partitioning, so at scale this is ONE shuffle and one
per-key sort; no Python anywhere. Both halves are expressible in plain
SQL, which is exactly what the DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .rollup import TIERS


def counter_increase(
    df: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per (key, bucket): total increase, number of resets, sample count.

    Output: series_key, bucket_ts, increase, n_resets, n_samples.
    `order_cols` break timestamp ties deterministically (e.g. an event id).
    """
    trunc = TIERS[tier]
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(key_col).orderBy(*order)
    v = F.col(value_col)
    delta = v - F.lag(v).over(w)
    inc = (
        F.when(delta.isNull(), F.lit(0.0))
        .when(delta < 0, v)
        .otherwise(delta)
    )
    reset = F.when(delta < 0, F.lit(1)).otherwise(F.lit(0))
    return (
        df.select(
            F.col(key_col).alias("series_key"),
            F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
            inc.alias("_inc"),
            reset.alias("_reset"),
        )
        .groupBy("series_key", "bucket_ts")
        .agg(
            F.sum("_inc").alias("increase"),
            F.sum("_reset").cast("long").alias("n_resets"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
