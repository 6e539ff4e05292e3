"""R stats::acf / pacf / ccf — exact reimplementation in numpy.

Semantics (reference: feasts R/acf.R:61-250 delegating to R stats):
  - acvf(k) = sum_{t<=n-k} (x_t - xbar)(x_{t+k} - xbar) / n   (divisor n!)
  - correlation(k) = acvf(k) / acvf(0)
  - NA handling: na.pass keeps NAs (pairs containing NA are skipped in the
    sums, mean is over non-NA); na.contiguous trims to the longest
    contiguous non-NA run first.
  - PACF: Durbin-Levinson recursion on the ACF (template: acf.R:124-141).
  - CCF:  r_xy(k) = c_xy(k) / sqrt(c_xx(0) * c_yy(0)), k = -L..L.
"""

from __future__ import annotations

import math

import numpy as np


def na_contiguous(x: np.ndarray) -> np.ndarray:
    """stats::na.contiguous — longest contiguous non-NA stretch.

    First-longest wins on ties, as in R.
    """
    x = np.asarray(x, dtype=np.float64)
    ok = ~np.isnan(x)
    if ok.all():
        return x
    if not ok.any():
        raise ValueError("all values are NA")
    # run-length over the ok mask
    change = np.flatnonzero(ok[1:] != ok[:-1])
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [x.size]))
    best_len, best_start = -1, 0
    for s, e in zip(starts, ends):
        if ok[s] and (e - s) > best_len:
            best_len, best_start = e - s, s
    return x[best_start:best_start + best_len]


def default_lag_max(n: int, n_series: int = 1) -> int:
    """stats::acf default: floor(10 * log10(N/m)), capped at n-1."""
    return min(int(math.floor(10.0 * math.log10(n / n_series))), n - 1)


def acf_r(
    x: np.ndarray,
    lag_max: int | None = None,
    demean: bool = True,
    na_action: str = "pass",
    type: str = "correlation",
) -> np.ndarray:
    """stats::acf()$acf — returns array of length lag_max+1 (lag 0 first)."""
    x = np.asarray(x, dtype=np.float64)
    if na_action == "contiguous":
        x = na_contiguous(x)
    elif na_action == "fail" and np.isnan(x).any():
        raise ValueError("series contains NA")
    n = x.size
    if lag_max is None:
        lag_max = default_lag_max(n)
    lag_max = min(lag_max, n - 1)
    ok = ~np.isnan(x)
    if demean:
        xc = x - np.nanmean(x)
    else:
        xc = x.copy()
    x0 = np.where(ok, xc, 0.0)
    acvf = np.empty(lag_max + 1, dtype=np.float64)
    for k in range(lag_max + 1):
        # pairs with any NA contribute 0; divisor is always n (R acf.c)
        acvf[k] = float(np.dot(x0[: n - k], x0[k:])) / n
    if type == "covariance":
        return acvf
    if acvf[0] == 0.0:
        return np.full(lag_max + 1, np.nan)
    return acvf / acvf[0]


def pacf_r(
    x: np.ndarray,
    lag_max: int | None = None,
    na_action: str = "pass",
) -> np.ndarray:
    """stats::pacf()$acf — partial autocorrelations, lags 1..lag_max.

    Durbin-Levinson recursion on the divisor-n ACF, matching the explicit
    template in reference acf.R:124-141 (and R's uni_pacf C routine).
    """
    x = np.asarray(x, dtype=np.float64)
    if na_action == "contiguous":
        x = na_contiguous(x)
    n = x.size
    if lag_max is None:
        lag_max = default_lag_max(n)
    lag_max = min(lag_max, n - 1)
    acf = acf_r(x, lag_max=lag_max, demean=True, na_action="pass")
    return durbin_levinson_pacf(acf, lag_max)


def durbin_levinson_pacf(acf: np.ndarray, lag_max: int) -> np.ndarray:
    """Durbin-Levinson recursion: ACF (lag 0..L) -> PACF (lag 1..L)."""
    acvf = np.asarray(acf, dtype=np.float64)  # works for corr (acvf[0]=1)
    p = lag_max
    phis = np.array([acvf[1] / acvf[0]])
    pev = np.empty(p + 1)
    pev[0] = acvf[0]
    pacf = np.empty(p)
    pacf[0] = phis[0]
    pev[1] = pev[0] * (1.0 - phis[0] ** 2)
    for k in range(2, p + 1):
        old = phis
        phi_kk = (acvf[k] - float(np.dot(old, acvf[k - 1:0:-1]))) / pev[k - 1]
        phis = np.empty(k)
        phis[k - 1] = phi_kk
        phis[: k - 1] = old - phi_kk * old[::-1]
        pacf[k - 1] = phi_kk
        pev[k] = pev[k - 1] * (1.0 - phi_kk ** 2)
    return pacf


def ccf_r(
    y: np.ndarray,
    x: np.ndarray,
    lag_max: int | None = None,
    na_action: str = "contiguous",
    type: str = "correlation",
) -> tuple[np.ndarray, np.ndarray]:
    """stats::ccf(y=, x=) — returns (lags, values), lags -L..L.

    ccf[k] = cor(x_{t+k}, y_t): positive lag means x leads y.
    Reference: acf.R:184-221; oracle test test-cf.R:50-68.
    """
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    if y.size != x.size:
        raise ValueError("x and y must have equal length")
    if na_action == "contiguous":
        ok = ~(np.isnan(x) | np.isnan(y))
        if not ok.all():
            # longest joint contiguous stretch
            joint = np.where(ok, 1.0, np.nan)
            idx = np.arange(x.size, dtype=np.float64)
            kept = na_contiguous(np.where(ok, idx, np.nan))
            sl = slice(int(kept[0]), int(kept[-1]) + 1)
            x, y = x[sl], y[sl]
    n = x.size
    if lag_max is None:
        lag_max = int(math.floor(10.0 * math.log10(n / 2.0)))
    lag_max = min(lag_max, n - 1)
    xc = x - x.mean()
    yc = y - y.mean()
    cxx0 = float(np.dot(xc, xc)) / n
    cyy0 = float(np.dot(yc, yc)) / n
    lags = np.arange(-lag_max, lag_max + 1)
    vals = np.empty(lags.size)
    for i, k in enumerate(lags):
        # c_xy(k) = (1/n) sum_t x_{t+k} y_t over valid t
        if k >= 0:
            vals[i] = float(np.dot(xc[k:], yc[: n - k])) / n
        else:
            vals[i] = float(np.dot(xc[: n + k], yc[-k:])) / n
    if type == "correlation":
        vals = vals / math.sqrt(cxx0 * cyy0)
    return lags, vals
