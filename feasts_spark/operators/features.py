"""features() — wide per-key feature extraction (SURVEY.md §3 EP1).

One Arrow-batched pandas UDF computes the ENTIRE feature pack per series
in a single pass over the group (one shuffle on the key, shared
intermediates: the STL remainder feeds stl_e_acf*, the ACF kernel is reused
across feat_acf / portmanteau). The output schema is static: columns that
the reference emits only for seasonal data (season_acf1, seasonal_strength_*
etc., SURVEY.md §1.3) are always present and NULL when period == 1.

Feature registry mirrors zzz.R:3-24 (name -> kernel -> tags).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from feasts_spark.kernels import (
    box_pierce,
    feat_acf,
    feat_intermittent,
    feat_pacf,
    feat_spectral,
    feat_stl,
    guerrero,
    ljung_box,
    longest_flat_spot,
    n_crossing_points,
    shift_kl_max,
    shift_level_max,
    shift_var_max,
    stat_arch_lm,
    var_tiled_mean,
    var_tiled_var,
)
from feasts_spark.kernels.extras import coef_hurst, unitroot_pp
from feasts_spark.kernels.stat_tests import unitroot_kpss, unitroot_ndiffs, unitroot_nsdiffs

# Registry: feature name -> (kernel, tags) — mirrors fabletools
# register_feature calls in reference zzz.R:3-24.
FEATURE_REGISTRY: dict[str, tuple] = {
    "feat_stl": (feat_stl, ("stl", "trend", "seasonal", "decomposition")),
    "feat_acf": (feat_acf, ("acf", "autocorrelation")),
    "feat_pacf": (feat_pacf, ("pacf", "autocorrelation")),
    "feat_intermittent": (feat_intermittent, ("intermittent",)),
    "guerrero": (guerrero, ("optimisation", "boxcox")),
    "unitroot_kpss": (unitroot_kpss, ("test", "unitroot")),
    "unitroot_pp": (unitroot_pp, ("test", "unitroot")),
    "coef_hurst": (coef_hurst, ("coefficients",)),
    "unitroot_ndiffs": (unitroot_ndiffs, ("test", "unitroot")),
    "unitroot_nsdiffs": (unitroot_nsdiffs, ("test", "seasonal", "unitroot")),
    "box_pierce": (box_pierce, ("test", "portmanteau")),
    "ljung_box": (ljung_box, ("test", "portmanteau")),
    "var_tiled_var": (var_tiled_var, ("lumpiness", "tile")),
    "var_tiled_mean": (var_tiled_mean, ("stability", "tile")),
    "shift_level_max": (shift_level_max, ("roll", "slide")),
    "shift_var_max": (shift_var_max, ("roll", "slide")),
    "shift_kl_max": (shift_kl_max, ("roll", "slide")),
    "feat_spectral": (feat_spectral, ("spectral",)),
    "n_crossing_points": (n_crossing_points, ("count",)),
    "longest_flat_spot": (longest_flat_spot, ("count", "rle")),
    "stat_arch_lm": (stat_arch_lm, ("test",)),
}

# Static output column order for the full pack.
FEATURE_COLUMNS = [
    # feat_stl
    "trend_strength", "seasonal_strength", "seasonal_peak", "seasonal_trough",
    "spikiness", "linearity", "curvature", "stl_e_acf1", "stl_e_acf10",
    # feat_acf / feat_pacf
    "acf1", "acf10", "diff1_acf1", "diff1_acf10", "diff2_acf1", "diff2_acf10",
    "season_acf1", "pacf5", "diff1_pacf5", "diff2_pacf5", "season_pacf",
    # spectral / basic
    "spectral_entropy", "n_crossing_points", "longest_flat_spot",
    "var_tiled_var", "var_tiled_mean",
    # shifts
    "shift_level_max", "shift_level_index", "shift_var_max", "shift_var_index",
    "shift_kl_max", "shift_kl_index",
    # model-ish
    "stat_arch_lm", "lambda_guerrero",
    "lb_stat", "lb_pvalue", "bp_stat", "bp_pvalue",
    # intermittency
    "zero_run_mean", "nonzero_squared_cv", "zero_start_prop", "zero_end_prop",
    # unit roots / long memory
    "kpss_stat", "kpss_pvalue", "pp_stat", "pp_pvalue", "ndiffs", "nsdiffs",
    "coef_hurst",
]

# coef_hurst is exact ARFIMA(0,d,0) ML. The likelihood is evaluated in
# O(n log n) via the closed-form Hosking predictor coefficients + FFT
# convolution (kernels/extras.py _arfima_negloglik_fft), so the pack can
# afford it on long series too; the cap is only a guard against
# pathological whales (NaN above it; call the kernel directly if needed).
# Round 2 capped this at 512 when the likelihood was the O(n^2)
# Durbin-Levinson sweep.
HURST_MAX_N = 65536

NAN = float("nan")

# kernel name -> output columns (single-period names; the seasonal triple
# is period-suffixed by pack_columns in the multi-seasonality case)
KERNEL_COLUMNS: dict[str, tuple[str, ...]] = {
    "feat_stl": (
        "trend_strength", "seasonal_strength", "seasonal_peak",
        "seasonal_trough", "spikiness", "linearity", "curvature",
        "stl_e_acf1", "stl_e_acf10",
    ),
    "feat_acf": (
        "acf1", "acf10", "diff1_acf1", "diff1_acf10", "diff2_acf1",
        "diff2_acf10", "season_acf1",
    ),
    "feat_pacf": ("pacf5", "diff1_pacf5", "diff2_pacf5", "season_pacf"),
    "feat_spectral": ("spectral_entropy",),
    "n_crossing_points": ("n_crossing_points",),
    "longest_flat_spot": ("longest_flat_spot",),
    "var_tiled_var": ("var_tiled_var",),
    "var_tiled_mean": ("var_tiled_mean",),
    "shift_level_max": ("shift_level_max", "shift_level_index"),
    "shift_var_max": ("shift_var_max", "shift_var_index"),
    "shift_kl_max": ("shift_kl_max", "shift_kl_index"),
    "stat_arch_lm": ("stat_arch_lm",),
    "guerrero": ("lambda_guerrero",),
    "ljung_box": ("lb_stat", "lb_pvalue"),
    "box_pierce": ("bp_stat", "bp_pvalue"),
    "feat_intermittent": (
        "zero_run_mean", "nonzero_squared_cv", "zero_start_prop",
        "zero_end_prop",
    ),
    "unitroot_kpss": ("kpss_stat", "kpss_pvalue"),
    "unitroot_pp": ("pp_stat", "pp_pvalue"),
    "unitroot_ndiffs": ("ndiffs",),
    "unitroot_nsdiffs": ("nsdiffs",),
    "coef_hurst": ("coef_hurst",),
}


def feature_set(
    tags: tuple[str, ...] | list[str] | None = None,
    names: tuple[str, ...] | list[str] | None = None,
) -> tuple[str, ...]:
    """fabletools feature_set(tags=...) over the FEATURE_REGISTRY: resolve
    tags and/or explicit kernel names to the kernel-name tuple that
    `features(..., select=)` accepts. Unknown names raise (a typo must
    not silently select nothing)."""
    out: list[str] = []
    if names:
        for nm in names:
            if nm not in FEATURE_REGISTRY:
                raise ValueError(f"unknown feature kernel: {nm!r}")
            out.append(nm)
    if tags:
        tagset = set(tags)
        for nm, (_, ktags) in FEATURE_REGISTRY.items():
            if tagset & set(ktags) and nm not in out:
                out.append(nm)
    if not out:
        raise ValueError("feature_set selected no kernels")
    return tuple(out)


def pack_columns(
    periods: tuple[int, ...] | None = None,
    select: tuple[str, ...] | None = None,
) -> list[str]:
    """Static output columns for the pack.

    Single-period (periods=None or one entry): the legacy unsuffixed
    seasonal triple. Multi-seasonality: per-period suffixed columns
    seasonal_strength_<p>/seasonal_peak_<p>/seasonal_trough_<p>, matching
    the reference's <name>-suffixed output (features.R:95-108).
    `select` (kernel names from feature_set()) restricts the columns to
    the selected kernels' outputs, preserving canonical order.
    """
    if select is None:
        base = list(FEATURE_COLUMNS)
    else:
        allowed: set[str] = set()
        for k in select:
            allowed.update(KERNEL_COLUMNS[k])
        base = [c for c in FEATURE_COLUMNS if c in allowed]
    if not periods or len(periods) == 1:
        return base
    triple = ("seasonal_strength", "seasonal_peak", "seasonal_trough")
    if not any(c in base for c in triple):
        return base
    per_season = [f"{b}_{p}" for p in periods for b in triple if b in base]
    rest = [c for c in base if c not in triple]
    if rest and rest[0] == "trend_strength":
        return rest[:1] + per_season + rest[1:]  # trend_strength first
    return per_season + rest


def compute_feature_pack(x: np.ndarray, period=1, select=None) -> dict:
    """All features for one series; returns {col: float} over pack_columns.

    `period` may be an int or a tuple of ints. With multiple periods the
    STL stage is MSTL and the seasonal triple is emitted per period; every
    other period-parameterized kernel (ACF seasonal lag, tiling sizes,
    guerrero, nsdiffs) uses the PRIMARY (first) period, as the reference
    does when fabletools hands it a single .period.

    `select` (kernel names, see feature_set()) runs only the selected
    kernels and returns only their columns; values are IDENTICAL to the
    full pack's (kernels share no state except feat_stl's seasonal
    strength, which nsdiffs recomputes when feat_stl is deselected).
    """
    period_list = (
        tuple(int(p) for p in period)
        if isinstance(period, (list, tuple))
        else (int(period),)
    )
    primary = period_list[0]
    multi = len(period_list) > 1
    selected = set(select) if select is not None else set(FEATURE_REGISTRY)
    out = dict.fromkeys(pack_columns(period_list, select), NAN)
    n = x.size

    def safe(fn, *a, **kw):
        try:
            return fn(*a, **kw)
        except Exception:
            return {}

    stl: dict = {}
    if "feat_stl" in selected:
        stl = safe(feat_stl, x, period=period_list if multi else primary)
    # single period: normalize the <name>-suffixed seasonal columns to the
    # legacy static names; multi: the suffixed names ARE the schema
    for k, v in stl.items():
        if not multi and k.startswith("seasonal_strength_"):
            k = "seasonal_strength"
        elif not multi and k.startswith("seasonal_peak_"):
            k = "seasonal_peak"
        elif not multi and k.startswith("seasonal_trough_"):
            k = "seasonal_trough"
        if k in out:
            out[k] = v
    period = primary
    for name, fn, kwargs in (
        ("feat_acf", feat_acf, {"period": period}),
        ("feat_pacf", feat_pacf, {"period": period}),
        ("feat_spectral", feat_spectral, {"period": period}),
        ("n_crossing_points", n_crossing_points, {}),
        ("longest_flat_spot", longest_flat_spot, {}),
        ("var_tiled_var", var_tiled_var, {"period": period}),
        ("var_tiled_mean", var_tiled_mean, {"period": period}),
        ("shift_level_max", shift_level_max, {"period": period}),
        ("shift_var_max", shift_var_max, {"period": period}),
        ("shift_kl_max", shift_kl_max, {"period": period}),
        ("stat_arch_lm", stat_arch_lm, {}),
        ("guerrero", guerrero, {"period": period}),
        ("ljung_box", ljung_box, {}),
        ("box_pierce", box_pierce, {}),
        ("feat_intermittent", feat_intermittent, {}),
        ("unitroot_kpss", unitroot_kpss, {}),
        ("unitroot_pp", unitroot_pp, {}),
        ("unitroot_ndiffs", unitroot_ndiffs, {}),
        # reuse the pack's own feat_stl seasonal strength for the d=1
        # gate; when feat_stl is deselected the kernel recomputes it
        ("unitroot_nsdiffs", unitroot_nsdiffs,
         {"period": period,
          "strength0": stl.get(f"seasonal_strength_{period}")}),
    ) + ((("coef_hurst", coef_hurst, {}),) if n <= HURST_MAX_N else ()):
        if name not in selected:
            continue
        for k, v in safe(fn, x, **kwargs).items():
            if k in out:
                out[k] = v
    return out


def features(
    df: DataFrame,
    key_col: str = "series_key",
    order_col: str = "bucket_ts",
    value_col: str = "val_avg",
    period=1,
    max_points: int = 2_000_000,
    min_points: int = 0,
    select: tuple[str, ...] | None = None,
) -> DataFrame:
    """Wide feature row per key — features(tsibble, value, feature_set()).

    Scale design: only (key, order, value) cross the shuffle + Arrow
    boundary (explicit projection — Catalyst cannot prune through the
    opaque UDF), and the within-series ordering is a vectorized
    `np.argsort(kind="stable")` take on the numpy arrays instead of a
    pandas DataFrame sort. On a 24M-turn Zipf corpus this measured 0.80
    stage scaling efficiency (2->8 pinned cores) vs 0.67 for the
    ship-everything + sort_values variant. Deliberately NOT relying on a
    JVM-side secondary sort: AQE partition coalescing may destroy the
    (key, order) sort and the re-inserted key-only sort is not stable.
    """
    period_list = (
        tuple(int(p) for p in period)
        if isinstance(period, (list, tuple))
        else (int(period),)
    )
    cols = pack_columns(period_list, select)
    key_type = df.schema[key_col].dataType.simpleString()
    schema = ", ".join(
        [f"{key_col} {key_type}"] + [f"{c} double" for c in cols]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < min_points:
            # in-group short-series filter: same semantics as an upstream
            # count semi-join without its aggregate + join shuffles
            return pd.DataFrame({c: [] for c in [key_col] + cols})
        if len(pdf) > max_points:
            # Whole-series features need the full history in one Arrow
            # group; fail loudly instead of OOMing an executor. Downsample
            # to a coarser tier (or raise max_points deliberately) first.
            raise ValueError(
                f"series {pdf[key_col].iloc[0]!r} has {len(pdf)} points > "
                f"max_points={max_points}; feature extraction holds one "
                "whole series per Arrow group — roll up to a coarser tier "
                "or raise max_points explicitly"
            )
        order = np.argsort(pdf[order_col].to_numpy(), kind="stable")
        x = pdf[value_col].to_numpy(dtype=np.float64)[order]
        row = compute_feature_pack(x, period=period_list, select=select)
        return pd.DataFrame([{key_col: pdf[key_col].iloc[0], **row}])

    pruned = df.select(key_col, order_col, value_col)
    return pruned.groupBy(key_col).applyInPandas(fn, schema=schema)
