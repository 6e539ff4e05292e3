"""feat_acf / feat_pacf — autocorrelation feature packs (features.R:616-695)."""

from __future__ import annotations

import numpy as np

from feasts_spark.kernels.acf import acf_r, pacf_r


def feat_acf(x, period: int = 1, lag_max: int | None = None) -> dict:
    """features.R:616-653 — ACF features of x, diff(x), diff2(x)."""
    x = np.asarray(x, dtype=np.float64)
    acfx = acf_r(x, lag_max=lag_max or max(period, 10), na_action="pass")
    acfd1 = acf_r(np.diff(x, n=1), lag_max=lag_max or 10, na_action="pass")
    acfd2 = acf_r(np.diff(x, n=2), lag_max=lag_max or 10, na_action="pass")
    out = {
        "acf1": float(acfx[1]),
        "acf10": float(np.sum(acfx[1:11] ** 2)),
        "diff1_acf1": float(acfd1[1]),
        "diff1_acf10": float(np.sum(acfd1[1:] ** 2)),
        "diff2_acf1": float(acfd2[1]),
        "diff2_acf10": float(np.sum(acfd2[1:] ** 2)),
    }
    if period > 1:
        out["season_acf1"] = float(acfx[period])
    return out


def feat_pacf(x, period: int = 1, lag_max: int | None = None) -> dict:
    """features.R:669-695 — PACF features of x, diff(x), diff2(x).

    Note the reference uses lag.max = max(period, 5) for ALL three series
    (original and both differences), and season_pacf = pacf at lag .period
    (pacfx[.period] where pacfx starts at lag 1).
    """
    x = np.asarray(x, dtype=np.float64)
    lm = lag_max or max(period, 5)
    pacfx = pacf_r(x, lag_max=lm)
    pacfd1 = pacf_r(np.diff(x, n=1), lag_max=lm)
    pacfd2 = pacf_r(np.diff(x, n=2), lag_max=lm)
    out = {
        "pacf5": float(np.sum(pacfx[:5] ** 2)),
        "diff1_pacf5": float(np.sum(pacfd1 ** 2)),
        "diff2_pacf5": float(np.sum(pacfd2 ** 2)),
    }
    if period > 1:
        out["season_pacf"] = float(pacfx[period - 1])
    return out
