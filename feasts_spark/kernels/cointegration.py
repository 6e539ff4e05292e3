"""Johansen cointegration test (features.R:249-261 wraps urca::ca.jo).

Implements the standard Johansen (1988, 1991) reduced-rank regression from
the published algorithm — NOT a port of urca's GPL code. Defaults mirror
the wrapper's effective defaults: K=2 lags, restricted constant
(ecdet="const"), long-run specification; both max-eigenvalue and trace
statistics are returned with p-values by linear interpolation of the
Osterwald-Lenum (1992) asymptotic critical values (published statistical
tables), rule=2 clamping like stats::approx in the reference wrapper.

Only the bivariate/trivariate tables are embedded (m <= 3) — the feature
use-case pairs two aligned series per key.
"""

from __future__ import annotations

import numpy as np

# Osterwald-Lenum (1992), Table 1* (H1*(r): restricted constant).
# rows: m - r (number of non-cointegrating directions), cols: 10%, 5%, 1%.
_CVAL_MAX_EIGEN = {
    1: (7.52, 9.24, 12.97),
    2: (13.75, 15.67, 20.20),
    3: (19.77, 22.00, 26.81),
}
_CVAL_TRACE = {
    1: (7.52, 9.24, 12.97),
    2: (17.85, 19.96, 24.60),
    3: (32.00, 34.91, 41.07),
}
_PCT = np.array([0.10, 0.05, 0.01])


def _interp_pvalue(cvals: tuple, stat: float) -> float:
    """stats::approx(cval, pct, xout=stat, rule=2) — linear, clamped."""
    x = np.asarray(cvals, dtype=np.float64)
    return float(np.interp(stat, x, _PCT))


def _residualize(y: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Residuals of each column of y on the columns of x (OLS)."""
    coef, *_ = np.linalg.lstsq(x, y, rcond=None)
    return y - x @ coef


def johansen(x: np.ndarray, K: int = 2) -> dict:
    """ca.jo(x, type=eigen/trace, ecdet="const", K=K, spec="longrun").

    x: (n, m) matrix of I(1) series, m in {2, 3}.
    Returns {"eigen_stats", "trace_stats", "eigen_pvalues",
    "trace_pvalues", "eigenvalues"} with statistics ordered r=0 first.
    """
    x = np.asarray(x, dtype=np.float64)
    n, m = x.shape
    if m not in (2, 3):
        raise ValueError("johansen: only m in {2,3} supported (cval tables)")
    if n <= K + m + 2:
        raise ValueError("series too short for Johansen test")
    dx = np.diff(x, axis=0)  # (n-1, m)
    # effective sample: t = K .. n-1 (0-based rows of dx from K-1)
    Z0 = dx[K - 1 :]  # Δx_t
    N = Z0.shape[0]
    # lagged differences Δx_{t-1} .. Δx_{t-K+1}
    lags = [dx[K - 1 - j : dx.shape[0] - j] for j in range(1, K)]
    Z1 = np.hstack(lags) if lags else np.empty((N, 0))
    # long-run levels x_{t-K} with restricted constant appended
    ZK = np.hstack([x[: n - K], np.ones((N, 1))])
    # partial out Z1 (short-run dynamics); with K=1 nothing to partial out
    if Z1.shape[1]:
        R0 = _residualize(Z0, Z1)
        RK = _residualize(ZK, Z1)
    else:  # K=1: nothing to partial out
        R0, RK = Z0, ZK
    S00 = R0.T @ R0 / N
    S0K = R0.T @ RK / N
    SKK = RK.T @ RK / N
    # solve |λ SKK − SK0 S00^-1 S0K| = 0 via Cholesky-whitened symmetric form
    L = np.linalg.cholesky(SKK)
    Linv = np.linalg.inv(L)
    A = Linv @ S0K.T @ np.linalg.solve(S00, S0K) @ Linv.T
    lam = np.linalg.eigvalsh(A)[::-1]  # descending
    lam = np.clip(lam[:m], 0.0, 1 - 1e-15)
    log1m = np.log(1.0 - lam)
    eigen_stats = -N * log1m  # max-eigen statistic for r = 0..m-1
    trace_stats = -N * np.cumsum(log1m[::-1])[::-1]  # sum over i >= r
    eigen_p = [
        _interp_pvalue(_CVAL_MAX_EIGEN[m - r], eigen_stats[r]) for r in range(m)
    ]
    trace_p = [
        _interp_pvalue(_CVAL_TRACE[m - r], trace_stats[r]) for r in range(m)
    ]
    return {
        "eigenvalues": lam,
        "eigen_stats": eigen_stats,
        "trace_stats": trace_stats,
        "eigen_pvalues": np.array(eigen_p),
        "trace_pvalues": np.array(trace_p),
    }


def cointegration_johansen(y: np.ndarray, x: np.ndarray, K: int = 2) -> dict:
    """Feature wrapper for two aligned series (reference returns the named
    stat/pvalue vectors; flattened here for a static schema)."""
    res = johansen(np.column_stack([y, x]), K=K)
    return {
        "johansen_stat_r0": float(res["eigen_stats"][0]),
        "johansen_stat_r1": float(res["eigen_stats"][1]),
        "johansen_pvalue_r0": float(res["eigen_pvalues"][0]),
        "johansen_pvalue_r1": float(res["eigen_pvalues"][1]),
        "johansen_trace_r0": float(res["trace_stats"][0]),
        "johansen_trace_pvalue_r0": float(res["trace_pvalues"][0]),
    }
