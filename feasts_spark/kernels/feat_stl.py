"""feat_stl (features.R:49-119) — STL-decomposition-based features."""

from __future__ import annotations

import numpy as np

from feasts_spark.kernels.acf import acf_r
from feasts_spark.kernels.rmath import ortho_poly_basis, r_var
from feasts_spark.kernels.stl import estimate_stl

NAN = float("nan")


def feat_stl(x, period=1, s_window: int = 11, period_name: str | None = None) -> dict:
    """STL feature pack.

    Returns trend_strength, spikiness, linearity, curvature, stl_e_acf1,
    stl_e_acf10, plus seasonal_strength_<name>/seasonal_peak_<name>/
    seasonal_trough_<name> PER seasonal period (features.R:95-108 emits
    the <name>-suffixed triple for every entry of `seasonalities`).

    `period` may be an int or a sequence of ints (multi-seasonality via
    MSTL, e.g. (24, 168) for hourly data with daily + weekly cycles);
    each period is kept only when len(x) > 2*period, mirroring the
    reference's season.args gate (features.R:52-56). Peak/trough
    positions are taken modulo each seasonality's OWN period.
    """
    x = np.asarray(x, dtype=np.float64)
    period_list = (
        [int(p) for p in period]
        if isinstance(period, (list, tuple, np.ndarray))
        else [int(period)]
    )
    if len(set(period_list)) != len(period_list):
        # duplicate periods would produce duplicate component names and
        # silently collapse in the name->period map below
        raise ValueError(f"duplicate seasonal periods: {period_list}")
    primary = period_list[0]
    periods, names, windows = [], [], []
    for p in period_list:
        if x.size > p * 2 and p > 0:
            periods.append(p)
            names.append(period_name if (period_name and len(period_list) == 1) else str(p))
            windows.append(s_window)

    # trim to longest contiguous non-NA run (features.R:58-70)
    ok = ~np.isnan(x)
    if not ok.all():
        change = np.flatnonzero(ok[1:] != ok[:-1])
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [x.size]))
        best_len, best_start = -1, 0
        for s, e in zip(starts, ends):
            if ok[s] and (e - s) > best_len:
                best_len, best_start = e - s, s
        offset = best_start  # 0-based; R rle_window[1] is offset+1
        x = x[best_start : best_start + best_len]
    else:
        offset = 0

    dcmp = estimate_stl(x, periods=periods, s_windows=windows, period_names=names)
    trend = dcmp["trend"]
    remainder = dcmp["remainder"]
    season_adjust = dcmp["season_adjust"]
    seas_keys = [k for k in dcmp if k.startswith("season_") and k != "season_adjust"]

    var_e = r_var(remainder)
    n = x.size

    # Spikiness: variance of leave-one-out variances (features.R:84-86)
    d = (remainder - np.nanmean(remainder)) ** 2
    var_loo = (var_e * (n - 1) - d) / (n - 2)
    spikiness = r_var(var_loo)

    # Linearity & curvature: projections onto orthonormal quadratic basis
    basis = ortho_poly_basis(n, 2)
    linearity = float(trend @ basis[:, 0])
    curvature = float(trend @ basis[:, 1])

    out = {"trend_strength": max(0.0, min(1.0, 1.0 - var_e / r_var(season_adjust)))}
    for k in seas_keys:
        seas = dcmp[k]
        nm = k[len("season_"):]
        out[f"seasonal_strength_{nm}"] = max(
            0.0, min(1.0, 1.0 - var_e / r_var(remainder + seas))
        )
    name_to_period = dict(zip(names, periods))
    for k in seas_keys:
        nm = k[len("season_"):]
        seas = dcmp[k]
        # hard lookup: an unexpected component name must raise, not fall
        # back to the primary period (wrong-modulus peak/trough)
        p = name_to_period[nm]
        # R: (which.max(seas) + rle_window[1] - 1) %% period, which.max 1-based
        out[f"seasonal_peak_{nm}"] = float((int(np.argmax(seas)) + 1 + offset) % p)
        out[f"seasonal_trough_{nm}"] = float((int(np.argmin(seas)) + 1 + offset) % p)

    acf_resid = acf_r(
        remainder, lag_max=max(10, *period_list), na_action="pass"
    )
    out.update(
        spikiness=spikiness,
        linearity=linearity,
        curvature=curvature,
        stl_e_acf1=float(acf_resid[1]),
        stl_e_acf10=float(np.sum(acf_resid[1:11] ** 2)),
    )
    return out
