"""SQL-native per-series feature computations (SURVEY.md §2.1 "SQL alt").

Each returns a DataFrame keyed by the series key, computed entirely with
built-in window/aggregate expressions — no Python in the hot path. The
__spark_entry__ driver queries wrap these so DuckDB oracles verify them
end to end at every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def acf1_expr(df: DataFrame, key_col: str, order_cols: list, value_col: str) -> DataFrame:
    """Lag-1 autocorrelation, R divisor-n semantics (features.R:617)."""
    wk = W.partitionBy(key_col)
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(value_col)
    s = (
        df.withColumn("_m", F.avg(v).over(wk))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn("_xc", v - F.col("_m"))
        .withColumn("_xc_next", F.lead("_xc").over(wo))
    )
    return s.groupBy(F.col(key_col).alias("series_key")).agg(
        (
            (F.sum(F.col("_xc") * F.col("_xc_next")) / F.max("_n"))
            / (F.sum(F.col("_xc") * F.col("_xc")) / F.max("_n"))
        ).alias("acf1")
    )


def crossing_points_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str
) -> DataFrame:
    """n_crossing_points (features.R:4-13): exact order-statistics median.

    The midline is computed as (v[(n+1) div 2] + v[n div 2 + 1]) / 2 over the
    value-sorted series — the same formula R's median() uses — instead of
    `percentile(...)`: interpolating percentile implementations differ in the
    last ULP across engines for even n, flipping `value <= med` for points
    exactly at the median. Order statistics + one IEEE add/divide are
    bitwise-reproducible everywhere.
    """
    wk = W.partitionBy(key_col)
    wv = W.partitionBy(key_col).orderBy(value_col)
    med = (
        df.select(key_col, value_col)
        .withColumn("_vrn", F.row_number().over(wv))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .filter(
            (F.col("_vrn") == F.expr("(_n + 1) div 2"))
            | (F.col("_vrn") == F.expr("_n div 2 + 1"))
        )
        .groupBy(key_col)
        .agg(F.avg(value_col).alias("_med"))
    )
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    s = (
        df.join(med, key_col)
        .withColumn("_ab", F.col(value_col) <= F.col("_med"))
        .withColumn("_ab_next", F.lead("_ab").over(wo))
    )
    return (
        s.filter(F.col("_ab_next").isNotNull())
        .groupBy(F.col(key_col).alias("series_key"))
        .agg(
            F.sum((F.col("_ab") != F.col("_ab_next")).cast("long")).alias(
                "n_crossing_points"
            )
        )
    )


def shift_level_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str, size: int = 10
) -> DataFrame:
    """shift_level_max/index (features.R:395-417) via rolling windows."""
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wroll = wo.rowsBetween(-(size - 1), 0)
    s = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_a", F.avg(value_col).over(wroll))
        .withColumn("_diff", F.abs(F.col("_a") - F.lag("_a", size).over(wo)))
        .filter(F.col("_diff").isNotNull())
    )
    wrank = W.partitionBy(key_col).orderBy(
        F.desc(F.round("_diff", 6)), F.asc("_rn")
    )
    return (
        s.withColumn("_rk", F.row_number().over(wrank))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(key_col).alias("series_key"),
            F.col("_diff").alias("shift_level_max"),
            (F.col("_rn") - F.lit(size - 1)).alias("shift_level_index"),
        )
    )


def var_tiled_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str, size: int = 10
) -> DataFrame:
    """var_tiled_mean (stability) + var_tiled_var (lumpiness),
    features.R:562-595: z-score, tile, var of tile means/vars."""
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wk = W.partitionBy(key_col)
    v = F.col(value_col)
    s = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn("_z", (v - F.avg(v).over(wk)) / F.stddev_samp(v).over(wk))
        .withColumn("_tile", ((F.col("_rn") - 1) / size).cast("long"))
    )
    tiles = s.groupBy(key_col, "_tile").agg(
        F.avg("_z").alias("_tmean"),
        F.var_samp("_z").alias("_tvar"),
        F.count(F.lit(1)).alias("_tn"),
        F.max("_n").alias("_n"),
    )
    return tiles.groupBy(F.col(key_col).alias("series_key")).agg(
        F.when(F.max("_n") < 2 * size, F.lit(0.0))
        .otherwise(F.var_samp("_tmean"))
        .alias("var_tiled_mean"),
        F.when(F.max("_n") < 2 * size, F.lit(0.0))
        .otherwise(F.var_samp(F.when(F.col("_tn") == size, F.col("_tvar"))))
        .alias("var_tiled_var"),
    )


def shift_var_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str, size: int = 10
) -> DataFrame:
    """shift_var_max/index (features.R:421-444): rolling var_samp windows.

    Same gaps-free window algebra as shift_level_df with var_samp — stays
    entirely in whole-stage codegen."""
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wroll = wo.rowsBetween(-(size - 1), 0)
    s = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_v", F.var_samp(value_col).over(wroll))
        .withColumn("_diff", F.abs(F.col("_v") - F.lag("_v", size).over(wo)))
        .filter(F.col("_diff").isNotNull())
    )
    wrank = W.partitionBy(key_col).orderBy(
        F.desc(F.round("_diff", 6)), F.asc("_rn")
    )
    return (
        s.withColumn("_rk", F.row_number().over(wrank))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(key_col).alias("series_key"),
            F.col("_diff").alias("shift_var_max"),
            (F.col("_rn") - F.lit(size - 1)).alias("shift_var_index"),
        )
    )
