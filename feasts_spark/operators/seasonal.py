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


def gg_tsdisplay_data(
    df: DataFrame,
    period: str = "1d",
    lag_max: int = 10,
    key_col: str = "series_key",
    ts_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> dict[str, DataFrame]:
    """Data for the gg_tsdisplay panel (ggtime re-export, reference
    graphics.R:20-22): the series itself, its ACF table, and the season
    split — three frames a client renders side by side. Pure composition
    of existing operators; each frame keeps its own documented plan
    shape (projection / one applyInPandas shuffle / projection)."""
    from feasts_spark.operators.cf import acf_table

    series = df.select(
        F.col(key_col), F.col(ts_col).alias("ts"),
        F.col(value_col).alias("val"),
    )
    acf = acf_table(
        df, lag_max=lag_max, key_col=key_col, order_col=ts_col,
        value_col=value_col,
    )
    season = gg_season_data(
        df, period=period, key_col=key_col, ts_col=ts_col,
        value_col=value_col, with_season_mean=False,
    )
    return {"series": series, "acf": acf, "season": season}


def gg_tsresiduals_data(
    components: DataFrame,
    lag_max: int = 10,
    key_col: str = "series_key",
    ts_col: str = "bucket_ts",
    remainder_col: str = "remainder",
    period: str = "1d",
) -> dict[str, DataFrame]:
    """Data for gg_tsresiduals (graphics.R:24-26): the same tsdisplay
    panel over a decomposition's remainder, plus the histogram counts the
    reference's third panel draws (binned driver-side-free: one groupBy
    on the rounded residual)."""
    if remainder_col not in components.columns:
        # STL components name it `remainder`, classical_decomposition
        # `random` (each matching its reference counterpart) — fail loud
        # rather than deep in analysis so the caller knows to pass
        # remainder_col explicitly.
        raise ValueError(
            f"remainder_col {remainder_col!r} not in components "
            f"{components.columns}; pass remainder_col='random' for "
            "classical_decomposition output"
        )
    panel = gg_tsdisplay_data(
        components, period=period, lag_max=lag_max, key_col=key_col,
        ts_col=ts_col, value_col=remainder_col,
    )
    hist = (
        components.select(
            F.col(key_col),
            F.round(F.col(remainder_col), 1).alias("bin"),
        )
        .groupBy(key_col, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return {"residuals": panel["series"], "acf": panel["acf"], "hist": hist}


def arma_irf_data(spark, ar=(), ma=(), horizon: int = 24) -> DataFrame:
    """Impulse-response data for the gg_irf plot (ggtime re-export,
    reference graphics.R:32-34): rows (h, psi) — the MA(infinity) weights
    psi_h of the ARMA(p,q) model, i.e. the response of y_{t+h} to a unit
    shock at t. Standard recursion: psi_0 = 1,
    psi_j = theta_j + sum_{i=1..min(j,p)} phi_i * psi_{j-i} (theta_j = 0
    past q). As with gg_arma, model fitting is out of scope (the reference
    receives a fable model); this is the O(p*horizon) driver-side data
    prep behind the plot."""
    import numpy as np

    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    phi = np.asarray(list(ar), dtype=np.float64)
    theta = np.asarray(list(ma), dtype=np.float64)
    psi = np.zeros(horizon + 1)
    psi[0] = 1.0
    for j in range(1, horizon + 1):
        acc = theta[j - 1] if j <= theta.size else 0.0
        for i in range(1, min(j, phi.size) + 1):
            acc += phi[i - 1] * psi[j - i]
        psi[j] = acc
    rows = [(int(h), float(p)) for h, p in enumerate(psi)]
    return spark.createDataFrame(rows, "h int, psi double")


def arma_roots_data(spark, ar=(), ma=()) -> DataFrame:
    """Inverse characteristic roots for the gg_arma plot (ggtime
    re-export, graphics.R:28-30): rows (kind, root_idx, re, im, modulus)
    — the unit-circle scatter gg_arma draws. Takes the fitted ARMA
    coefficient vectors (model fitting itself is out of scope, as in the
    reference where gg_arma receives a fable model). Driver-side numpy
    on O(p+q) coefficients; returned as a DataFrame for plan uniformity."""
    import numpy as np

    rows = []
    for kind, coefs in (("AR", ar), ("MA", ma)):
        coefs = list(coefs)
        if not coefs:
            continue
        # inverse roots of 1 - c1 z - ... - cp z^p (AR) / 1 + c z (MA uses +)
        sign = -1.0 if kind == "AR" else 1.0
        poly = np.r_[1.0, sign * np.asarray(coefs, dtype=np.float64)][::-1]
        for i, r in enumerate(np.roots(poly)):
            inv = 1.0 / r if r != 0 else complex(0.0)
            rows.append(
                (kind, i, float(inv.real), float(inv.imag), float(abs(inv)))
            )
    return spark.createDataFrame(
        rows, "kind string, root_idx int, re double, im double, modulus double"
    )
