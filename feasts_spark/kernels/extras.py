"""Remaining feature kernels: Phillips-Perron, Hurst (ARFIMA-ML), MBB
bootstrap, tapered ACF.

unitroot_pp  — features.R:152-159 via urca::ur.pp (Z-tau, constant model,
               short lags): OLS y_t ~ y_{t-1}, Newey-West long-run variance,
               p by interpolation of the Dickey-Fuller constant-model table
               (clamped, rule=2).
coef_hurst   — features.R:372-376: d + 0.5 from fracdiff(x, 0, 0). Here d is
               the EXACT Gaussian MLE of ARFIMA(0,d,0) on [0, 0.5] via
               Durbin-Levinson innovations (fracdiff uses the Haslett &
               Raftery approximation of the same likelihood; both clamp at
               the boundary for the golden series).
mbb / generate_stl — stl.R:142-197: moving-block bootstrap of the STL
               remainder, seeded numpy Generator for determinism.
tacf         — acf.R:252-300: banded+tapered autocorrelation estimate with
               eigenvalue shrinkage (McMurry & Politis 2010).
"""

from __future__ import annotations

import math

import numpy as np

from feasts_spark.kernels.acf import acf_r, na_contiguous
from feasts_spark.kernels.rmath import brent_fmin

# Dickey-Fuller tau critical values, constant model (Fuller 1976 / urca),
# rows: n = 25, 50, 100, 250, 500, inf
_DF_TAU_MU_N = np.array([25, 50, 100, 250, 500, 100000], dtype=np.float64)
_DF_TAU_MU = {
    0.01: np.array([-3.75, -3.58, -3.51, -3.46, -3.44, -3.43]),
    0.05: np.array([-3.00, -2.93, -2.89, -2.88, -2.87, -2.86]),
    0.10: np.array([-2.63, -2.60, -2.58, -2.57, -2.57, -2.57]),
}


def unitroot_pp(x, type: str = "Z-tau", lags: str = "short") -> dict:
    """Phillips-Perron unit root test, constant model."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    y = x[1:]
    yl = x[:-1]
    n = y.size
    # OLS y = mu + rho*yl
    X = np.column_stack([np.ones(n), yl])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    res = y - X @ beta
    s2 = float(res @ res) / (n - 2)  # regression variance
    xtx_inv = np.linalg.inv(X.T @ X)
    se_rho = math.sqrt(s2 * xtx_inv[1, 1])
    rho = beta[1]
    t_rho = (rho - 1.0) / se_rho
    lmax = int(4 * (n / 100.0) ** 0.25) if lags == "short" else int(
        12 * (n / 100.0) ** 0.25
    )
    gamma0 = float(res @ res) / n
    lam2 = gamma0
    for j in range(1, lmax + 1):
        w = 1.0 - j / (lmax + 1.0)
        lam2 += 2.0 * w * float(res[j:] @ res[:-j]) / n
    stat = (
        math.sqrt(gamma0 / lam2) * t_rho
        - (lam2 - gamma0) / (2.0 * math.sqrt(lam2)) * (n * se_rho / math.sqrt(s2))
    )
    # interpolate critical values by n, then p-value by stat (clamped)
    cvals = np.array([
        np.interp(n, _DF_TAU_MU_N, _DF_TAU_MU[p]) for p in (0.01, 0.05, 0.10)
    ])
    pvals = np.array([0.01, 0.05, 0.10])
    pval = float(np.interp(stat, cvals, pvals))  # clamps (approx rule=2)
    return {"pp_stat": stat, "pp_pvalue": pval}


# ---------------------------------------------------------------------------
# ARFIMA(0,d,0) exact ML -> Hurst coefficient
# ---------------------------------------------------------------------------

def _arfima_acf(d: float, n: int) -> np.ndarray:
    """Autocorrelations rho(0..n-1) of ARFIMA(0,d,0):
    rho(k) = rho(k-1) * (k-1+d)/(k-d)."""
    rho = np.empty(n)
    rho[0] = 1.0
    for k in range(1, n):
        rho[k] = rho[k - 1] * (k - 1 + d) / (k - d)
    return rho


def _arfima_negloglik(d: float, x: np.ndarray) -> float:
    """Profile (sigma^2 concentrated out) Gaussian -2loglik via
    Durbin-Levinson innovations."""
    n = x.size
    rho = _arfima_acf(d, n)
    # Durbin-Levinson: one-step prediction errors and variances
    phis = np.zeros(n)
    v = np.empty(n)  # prediction error variance ratio (relative to gamma0)
    v[0] = 1.0
    e = np.empty(n)
    e[0] = x[0]
    phis_prev = np.zeros(0)
    logdet = 0.0
    for k in range(1, n):
        if k == 1:
            phi_kk = rho[1]
            phis_cur = np.array([phi_kk])
        else:
            phi_kk = (rho[k] - float(phis_prev @ rho[k - 1:0:-1])) / v[k - 1]
            phis_cur = np.empty(k)
            phis_cur[k - 1] = phi_kk
            phis_cur[: k - 1] = phis_prev - phi_kk * phis_prev[::-1]
        v[k] = v[k - 1] * (1.0 - phi_kk**2)
        e[k] = x[k] - float(phis_cur @ x[k - 1 :: -1][:k])
        phis_prev = phis_cur
    logdet = float(np.sum(np.log(v)))
    ssr = float(np.sum(e * e / v))
    # concentrated -2loglik (dropping constants)
    return n * math.log(ssr / n) + logdet


def _arfima_negloglik_fft(d: float, x: np.ndarray) -> float:
    """Same profile -2loglik as _arfima_negloglik in O(n log n).

    The finite-predictor coefficients of ARFIMA(0,d,0) have the closed
    form (Hosking 1981, fractional differencing)
        phi_kj = C(k,j) * Γ(j-d) Γ(k-j+1-d) / (-Γ(-d) Γ(k+1-d))
    which factorizes as phi_kj = A_k * g_j * h_{k-j} with
        g_j = Γ(j-d)/Γ(j+1),  h_m = Γ(m+1-d)/Γ(m+1),
        A_k = k! / (-Γ(-d) Γ(k+1-d)) — all O(n) cumprod recurrences —
    so every innovation e_k = x_k - A_k * Σ_j g_j (h_{k-j} x_{k-j}) is
    one FFT convolution instead of the O(n^2) Durbin-Levinson sweep.
    Innovation variances come from the closed-form PACF d/(k-d).
    Matches _arfima_negloglik (kept as the reference implementation,
    cross-checked in tests) to ~1e-10 relative."""
    n = x.size
    if d <= 0.0 or n < 2:
        # d=0 is white noise: e = x, v = 1
        return n * math.log(float(x @ x) / n)
    jj = np.arange(1.0, n)
    g1 = math.gamma(1.0 - d)
    g = np.empty(n)
    g[0] = 0.0
    g[1] = g1
    if n > 2:
        np.cumprod((jj[:-1] - d) / (jj[:-1] + 1.0), out=g[2:])
        g[2:] *= g1
    h = np.empty(n)
    h[0] = g1
    np.cumprod((jj - d) / jj, out=h[1:])
    h[1:] *= g1
    A = np.empty(n)
    A[0] = 0.0
    A[1] = d / (g1 * math.gamma(2.0 - d))
    if n > 2:
        np.cumprod((jj[:-1] + 1.0) / (jj[:-1] + 1.0 - d), out=A[2:])
        A[2:] *= A[1]
    L = 1 << (2 * n - 1).bit_length()
    s = np.fft.irfft(np.fft.rfft(g, L) * np.fft.rfft(h * x, L), L)[:n]
    e = x - A * s
    pacf = d / (jj - d)
    log_v = np.cumsum(np.log1p(-pacf * pacf))
    vinv = np.empty(n)
    vinv[0] = 1.0
    np.exp(-log_v, out=vinv[1:])
    ssr = float(np.sum(e * e * vinv))
    return n * math.log(ssr / n) + float(np.sum(log_v))


def coef_hurst(x) -> dict:
    """features.R:372-376 — Hurst = d + 0.5, d = MLE on [0, 0.5]."""
    x = na_contiguous(np.asarray(x, dtype=np.float64))
    xc = x - x.mean()
    d = brent_fmin(lambda d_: _arfima_negloglik_fft(d_, xc), 0.0, 0.5 - 1e-9)
    return {"coef_hurst": d + 0.5}


# ---------------------------------------------------------------------------
# Moving-block bootstrap (stl.R:142-150) + generate (stl.R:171-197)
# ---------------------------------------------------------------------------

def mbb(x: np.ndarray, window_size: int, rng: np.random.Generator) -> np.ndarray:
    """Moving-block bootstrap of a series, R MBB semantics."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    w = int(window_size)
    nblocks = n // w + 2
    bx = np.empty(nblocks * w)
    for i in range(nblocks):
        c = int(rng.integers(0, n - w + 1))
        bx[i * w : (i + 1) * w] = x[c : c + w]
    start = int(rng.integers(0, w))
    return bx[start : start + n]


def generate_stl(
    trend: np.ndarray,
    seasonals: list[np.ndarray],
    remainder: np.ndarray,
    period: int,
    times: int = 1,
    seed: int = 42,
) -> list[np.ndarray]:
    """generate.stl_decomposition: sim = trend + seasons + MBB(remainder).

    block_size = 2*period when period > 1 else min(8, n // 2) (stl.R:183).
    Deterministic via seeded numpy Generator (distribution-level parity with
    the reference; R's RNG stream is not reproducible outside R).
    """
    n = remainder.size
    block = 2 * period if period > 1 else min(8, n // 2)
    rng = np.random.default_rng(seed)
    base = trend + (np.sum(seasonals, axis=0) if seasonals else 0.0)
    return [base + mbb(remainder, block, rng) for _ in range(times)]


# ---------------------------------------------------------------------------
# Tapered ACF (acf.R:252-300)
# ---------------------------------------------------------------------------

def tacf(x) -> np.ndarray:
    """Banded + tapered ACF with eigenvalue shrinkage; returns lags 0..n-1."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    acf = acf_r(x, lag_max=n - 1, na_action="pass")
    s = np.arange(1, acf.size + 1, dtype=np.float64)
    upper = 2.0 * math.sqrt(math.log10(n) / n)
    ac = np.abs(acf)
    j = ac < upper
    l = 0
    k = 0
    N = j.size - 4
    while l < 1 and k < N:
        if j[k : k + 5].all():
            l = k + 1  # R 1-based index
        else:
            k += 1
    if l < 1:
        l = 1
    sl = s / l
    taper = np.zeros(sl.size)
    taper[sl <= 1] = 1.0
    mid = (sl > 1) & (sl <= 2)
    taper[mid] = 2.0 - sl[mid]
    gamma = acf * taper
    m = gamma.size
    # Toeplitz autocovariance matrix
    idx = np.abs(np.subtract.outer(np.arange(m), np.arange(m)))
    Gamma = gamma[idx]
    vals, vecs = np.linalg.eigh(Gamma)
    d = np.maximum(vals, 20.0 / n)
    Gamma2 = (vecs * d) @ vecs.T
    Gamma2 = Gamma2 / d.mean()
    out = gamma.copy()
    for i in range(1, m):
        out[i] = float(np.mean(np.diagonal(Gamma2, offset=i)))
    return out


def pacf_tapered(x, lag_max: int | None = None) -> np.ndarray:
    """Tapered PACF (reference acf.R:118-138, PACF(tapered=TRUE)).

    Durbin-Levinson recursion applied to the tacf() banded/tapered
    autocorrelation estimate instead of the sample ACF — the reference's
    "LD-recursions" template with acvf = tacf(x).
    """
    from feasts_spark.kernels.acf import default_lag_max, durbin_levinson_pacf

    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if lag_max is None:
        lag_max = default_lag_max(n)
    lag_max = min(lag_max, n - 2)
    acvf = tacf(x)
    return durbin_levinson_pacf(acvf, lag_max)
