"""Season-plot / lag-plot data preparation (feasts' graphics surface).

The reference re-exports ``gg_season``, ``gg_subseries`` and ``gg_lag``
from the ggtime package (reference NAMESPACE:58-60,104-107). Rendering is
out of scope here, but each plot is a deterministic data transformation
over a tsibble, and at 10^12-turn scale THAT transformation is the hard
part — the plotting client only ever sees the reduced frame. These
operators produce exactly the frames those plots draw:

- ``gg_season``: one line per seasonal cycle — x = position within the
  period, colour = cycle instance.
- ``gg_subseries``: one facet per position within the period, x = cycle,
  plus the per-position mean hline (the blue line in the plot).
- ``gg_lag``: y_t against y_{t-k} for each requested lag k.

Spark-first shapes: the season/cycle split is pure projection arithmetic
on the timestamp (no shuffle; whole-stage codegen), the subseries mean is
one window over (key, position), and the lag pairs are a single ordered
window pass whose ``F.lag`` columns Catalyst fuses into one Window node
before an explode — one shuffle each, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# date_trunc field for the seasonal period (the cycle length). Sub-bucket
# granularity is implicit: `pos` is the second offset into the cycle, so
# any tier (1m/1h/...) nests without configuration.
_PERIOD_FIELD = {"1h": "hour", "1d": "day", "1w": "week", "1y": "year"}


def _cycle(ts_col: str, period: str) -> Column:
    try:
        field = _PERIOD_FIELD[period]
    except KeyError:
        raise ValueError(
            f"unsupported season period {period!r}; one of {sorted(_PERIOD_FIELD)}"
        ) from None
    return F.date_trunc(field, F.col(ts_col))


def gg_season_data(
    df: DataFrame,
    period: str = "1d",
    key_col: str = "series_key",
    ts_col: str = "bucket_ts",
    value_col: str = "val_avg",
    with_season_mean: bool = True,
) -> DataFrame:
    """Rows (key, cycle, pos, value[, season_mean]) for season/subseries plots.

    ``cycle`` is the period instance (date_trunc of the timestamp) and
    ``pos`` the second offset into it — gg_season draws value over pos
    grouped by cycle; gg_subseries draws value over cycle faceted by pos,
    with ``season_mean`` (mean over cycles at the same pos) as its
    reference line, so one frame serves both re-exports.

    ``with_season_mean=False`` keeps the operator a pure projection
    (zero shuffles — it streams at scan speed at any scale); the mean
    adds the one unavoidable exchange on (key, pos).
    """
    cycle = _cycle(ts_col, period)
    out = df.select(
        F.col(key_col),
        cycle.alias("cycle"),
        (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(cycle)).alias("pos"),
        F.col(value_col).alias("val"),
    )
    if with_season_mean:
        out = out.withColumn(
            "season_mean",
            F.avg("val").over(Window.partitionBy(key_col, "pos")),
        )
    return out


def gg_lag_data(
    df: DataFrame,
    lags: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9),
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> DataFrame:
    """Rows (key, lag, rn, val, val_lag) — the gg_lag scatter frame.

    ``rn`` is the 1-based position in the ordered series (stable join key
    for verification); pairs whose lagged side precedes the series start
    are dropped, matching the plot (it draws nothing for them). One
    ordered window pass computes every lag column — Catalyst collapses
    the per-lag ``F.lag`` expressions into a single Window node — then an
    explode unpivots to the long frame.
    """
    if not lags or any(k <= 0 for k in lags):
        raise ValueError(f"lags must be positive ints, got {lags!r}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(k)).alias("lag"),
                F.lag(value_col, int(k)).over(w).alias("val_lag"),
            )
            for k in lags
        ]
    )
    return (
        df.select(
            F.col(key_col),
            F.row_number().over(w).alias("rn"),
            F.col(value_col).alias("val"),
            pairs.alias("_pairs"),
        )
        .select(key_col, "rn", "val", F.explode("_pairs").alias("_p"))
        .select(
            key_col,
            F.col("_p.lag").alias("lag"),
            "rn",
            "val",
            F.col("_p.val_lag").alias("val_lag"),
        )
        .filter(F.col("val_lag").isNotNull())
    )
