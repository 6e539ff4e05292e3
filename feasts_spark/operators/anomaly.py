"""Anomaly flagging on decomposition residuals — SQL-native.

The anomalize-style recipe over the engine's own SQL classical
decomposition: a point is anomalous when its remainder falls outside
median(remainder) ± k * IQR(remainder) per series (Tukey fences on the
deseasonalized, detrended residual). Everything is windows/aggregates on
top of classical_decomposition's codegen plan — no Python — and the
quartiles use exact order statistics (the same cross-engine-stable
construction as crossing_points' median), so a DuckDB oracle replays the
flags bit-for-bit.

Order statistics: for quantile q over n values, take
rank = (n-1)*q + 1 in 1-based sorted order and interpolate linearly
between floor(rank) and ceil(rank) — R's default type-7 quantile, which
both engines reproduce exactly from sorted row_numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from feasts_spark.operators.decompose import classical_decomposition


def _type7_quantiles(
    df: DataFrame, key_col: str, value_col: str, qs: dict[str, float]
) -> DataFrame:
    """Per-key R type-7 quantiles at several probabilities in ONE ranked
    pass + ONE conditional aggregate (the same shape the DuckDB oracle
    uses), instead of a window/aggregate/join pipeline per quantile."""
    wv = W.partitionBy(key_col).orderBy(value_col)
    wk = W.partitionBy(key_col)
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_qrn", F.row_number().over(wv))
        .withColumn("_qn", F.count(F.lit(1)).over(wk))
    )
    aggs = [F.max("_qn").alias("_qn")]
    for name, q in qs.items():
        # rank = (n-1)*q + 1 ; lo = floor(rank), hi = lo + 1
        lo = F.floor((F.col("_qn") - 1) * F.lit(q) + 1)
        aggs += [
            F.min(F.when(F.col("_qrn") == lo, F.col(value_col))).alias(
                f"{name}_lo"
            ),
            F.min(F.when(F.col("_qrn") == lo + 1, F.col(value_col))).alias(
                f"{name}_hi"
            ),
        ]
    agg = ranked.groupBy(key_col).agg(*aggs)
    sel = [F.col(key_col)]
    for name, q in qs.items():
        rank = (F.col("_qn") - 1) * F.lit(q) + 1
        frac = rank - F.floor(rank)
        vlo, vhi = F.col(f"{name}_lo"), F.col(f"{name}_hi")
        sel.append(
            (vlo + frac * (F.coalesce(vhi, vlo) - vlo)).alias(name)
        )
    return agg.select(*sel)


def anomaly_flags(
    df: DataFrame,
    period: int,
    k: float = 3.0,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> DataFrame:
    """Flag points whose decomposition remainder is outside the Tukey
    fences median ± k*IQR (computed per series on non-null remainders).

    Output: key, order, value, remainder, is_anomaly (+ fence bounds).
    Rows where the remainder is NULL (the centered-MA edge rows) carry
    is_anomaly NULL.
    """
    comp = classical_decomposition(
        df, period=period, key_col=key_col, order_col=order_col,
        value_col=value_col,
    ).select(
        key_col, order_col, F.col(value_col).alias("value"), F.col("random")
    )
    quart = _type7_quantiles(
        comp, key_col, "random", {"_q1": 0.25, "_med": 0.50, "_q3": 0.75}
    )
    fences = (
        quart.withColumn("_iqr", F.col("_q3") - F.col("_q1"))
        .select(
            key_col,
            (F.col("_med") - F.lit(k) * F.col("_iqr")).alias("fence_lo"),
            (F.col("_med") + F.lit(k) * F.col("_iqr")).alias("fence_hi"),
        )
    )
    return comp.join(fences, key_col).select(
        key_col, order_col, "value",
        F.col("random").alias("remainder"),
        "fence_lo", "fence_hi",
        F.when(
            F.col("random").isNotNull(),
            (F.col("random") < F.col("fence_lo"))
            | (F.col("random") > F.col("fence_hi")),
        ).alias("is_anomaly"),
    )
