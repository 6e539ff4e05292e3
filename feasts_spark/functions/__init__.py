"""Column-level helpers: SQL-native feature expressions.

These are the Catalyst-side (whole-stage-codegen) counterparts of a subset
of the kernels — used when a feature is needed inline in a larger SQL plan
without paying the Arrow/Python boundary. The UDF kernels remain the
oracle-exact versions; these match them exactly for the features whose math
is pure windowed arithmetic (validated in __spark_entry__ oracles).
"""

from feasts_spark.functions.sql_features import (
    acf1_expr,
    crossing_points_df,
    kpss_df,
    pacf12_df,
    shift_level_df,
    shift_var_df,
    var_tiled_df,
)

__all__ = [
    "acf1_expr",
    "crossing_points_df",
    "kpss_df",
    "pacf12_df",
    "shift_level_df",
    "shift_var_df",
    "var_tiled_df",
]
