"""Portmanteau tests (tests.R:19-31) and unit-root tests (features.R:139-235).

ljung_box / box_pierce reproduce stats::Box.test exactly; the chi-square
p-value uses the hand-built regularized incomplete gamma (rmath.chi2_sf).

unitroot_kpss reproduces urca::ur.kpss (type="mu", lags="short") from its
published formula: partial-sum statistic with a Bartlett-window long-run
variance, p-value by linear interpolation of the tabulated critical values
(clamped, rule=2). unitroot_ndiffs / unitroot_nsdiffs compose these per
features.R:181-235.
"""

from __future__ import annotations

import math

import numpy as np

from feasts_spark.kernels.acf import acf_r
from feasts_spark.kernels.rmath import chi2_sf


def ljung_box(x, lag: int = 1, dof: int = 0) -> dict:
    """tests.R:19-22 — Q = n(n+2) * sum_k r_k^2/(n-k); p = 1-pchisq(Q, lag-dof)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    r = acf_r(x, lag_max=lag, na_action="pass")[1 : lag + 1]
    stat = n * (n + 2.0) * float(np.sum(r ** 2 / (n - np.arange(1, lag + 1))))
    return {"lb_stat": stat, "lb_pvalue": chi2_sf(stat, lag - dof)}


def box_pierce(x, lag: int = 1, dof: int = 0) -> dict:
    """tests.R:28-31 — Q = n * sum_k r_k^2; p = 1-pchisq(Q, lag-dof)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    r = acf_r(x, lag_max=lag, na_action="pass")[1 : lag + 1]
    stat = n * float(np.sum(r ** 2))
    return {"bp_stat": stat, "bp_pvalue": chi2_sf(stat, lag - dof)}


# ---------------------------------------------------------------------------
# KPSS (urca::ur.kpss semantics; used by features.R:139-144, 181-203)
# ---------------------------------------------------------------------------

# Critical value tables from Kwiatkowski et al. (1992), as tabulated in urca.
_KPSS_CVAL = {
    "mu": {"10pct": 0.347, "5pct": 0.463, "2.5pct": 0.574, "1pct": 0.739},
    "tau": {"10pct": 0.119, "5pct": 0.146, "2.5pct": 0.176, "1pct": 0.216},
}


def unitroot_kpss(x, type: str = "mu", lags: str = "short") -> dict:
    """features.R:139-144 via urca::ur.kpss.

    type "mu": residuals from demeaning; "tau": residuals from detrending.
    lags "short": l = trunc(4*(n/100)^0.25); "long": trunc(12*(n/100)^0.25);
    "nil": 0. Statistic = sum(S_t^2) / (n^2 * s^2(l)) with Bartlett weights.
    P-value by linear interpolation of the critical-value table (rule=2).
    """
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = x.size
    if type == "mu":
        e = x - x.mean()
    else:
        t = np.arange(1, n + 1, dtype=np.float64)
        X = np.column_stack([np.ones(n), t])
        beta, *_ = np.linalg.lstsq(X, x, rcond=None)
        e = x - X @ beta
    if lags == "short":
        l = int(4 * (n / 100.0) ** 0.25)
    elif lags == "long":
        l = int(12 * (n / 100.0) ** 0.25)
    else:
        l = 0
    s2 = float(e @ e) / n
    for k in range(1, l + 1):
        w = 1.0 - k / (l + 1.0)
        s2 += 2.0 * w * float(e[k:] @ e[:-k]) / n
    S = np.cumsum(e)
    stat = float(S @ S) / (n * n * s2)
    cv = _KPSS_CVAL[type]
    xs = np.array([cv["10pct"], cv["5pct"], cv["2.5pct"], cv["1pct"]])
    ys = np.array([0.10, 0.05, 0.025, 0.01])
    pval = float(np.interp(stat, xs, ys))  # np.interp clamps = approx rule 2
    return {"kpss_stat": stat, "kpss_pvalue": pval}


def unitroot_ndiffs(x, alpha: float = 0.05, differences=(0, 1, 2)) -> dict:
    """features.R:181-203 — min differences for stationarity by KPSS p-value."""
    x = np.asarray(x, dtype=np.float64)

    def diffd(v, d):
        return v if d == 0 else np.diff(v, n=d)

    diffs = [d for d in differences if not np.all(np.isnan(diffd(x, d)))]
    keep = [True]
    for d in diffs[1:]:
        pv = unitroot_kpss(diffd(x, d - 1))["kpss_pvalue"]
        keep.append(pv < alpha)
    chosen = [d for d, k in zip(diffs, keep) if k]
    return {"ndiffs": float(max(chosen))}


def unitroot_nsdiffs(x, alpha: float = 0.05, differences=(0, 1, 2), period: int = 1,
                     strength0: float | None = None) -> dict:
    """features.R:209-235 — seasonal differences needed (feat_stl strength < 0.64).

    strength0: optionally pass the already-computed seasonal strength of the
    undifferenced series (the feature pack reuses its feat_stl result) —
    saves one full STL per series; semantics unchanged.
    """
    from feasts_spark.kernels.feat_stl import feat_stl

    if period == 1:
        return {"nsdiffs": float(min(differences))}
    x = np.asarray(x, dtype=np.float64)

    def sdiff(v, d):
        for _ in range(d):
            v = v[period:] - v[:-period]
        return v

    diffs = [d for d in differences if not np.all(np.isnan(sdiff(x, d)))]
    # R: unitroot_fn = ~feat_stl(.)[2] < 0.64, then `fn(...) < alpha` on the
    # logical result — TRUE(1) < 0.05 is FALSE — so a difference level d is
    # kept exactly when seasonal strength of the (d-1)-differenced series
    # is >= 0.64.
    keep = [True]
    for d in diffs[1:]:
        if d == 1 and strength0 is not None:
            strength = strength0
        else:
            ft = feat_stl(sdiff(x, d - 1), period=period)
            strength = ft.get(f"seasonal_strength_{period}", 0.0)
        # no early exit: the reference keeps max over ALL kept levels
        # (features.R:233-234 — d=2 can win even when d=1 was rejected)
        keep.append(strength >= 0.64)
    chosen = [d for d, k in zip(diffs, keep) if k]
    return {"nsdiffs": float(max(chosen))}
