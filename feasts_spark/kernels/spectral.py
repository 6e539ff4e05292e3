"""feat_spectral (features.R:528-545) — Burg AR spectral entropy.

Reimplements the R chain stats::spec.ar(method='burg') -> ar.burg ->
C Burg recursion, entirely in numpy:
  1. demean x
  2. Burg recursion up to order.max = min(n-1, floor(10*log10(n)))
     with var1[p] = var1[p-1]*(1-k_p^2) (R var.method=1)
  3. AIC order selection: aic(p) = n*log(var1[p]) + 2p + 2  (demean adds 2,
     constant in p so irrelevant to argmin; kept for fidelity)
  4. spectral density on freq grid seq(0, 0.5, length.out=n.freq):
     spec(f) = var.pred / (xfreq * |1 - sum_k a_k e^{-2 pi i f k}|^2)
  5. mirror, normalize, blend 0.1% uniform prior, entropy base n, cap at 1.
"""

from __future__ import annotations

import math

import numpy as np

from feasts_spark.kernels.acf import na_contiguous

NAN = float("nan")


def burg_ar(x: np.ndarray, order_max: int | None = None, demean: bool = True):
    """R ar.burg (var.method=1): returns (order, ar_coefs, var_pred_scaled).

    Coefficients for EVERY order 0..order_max are computed by the Burg
    lattice recursion; AIC picks the order.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if demean:
        x = x - x.mean()
    if order_max is None:
        order_max = min(n - 1, int(math.floor(10.0 * math.log10(n))))
    # Burg lattice recursion (textbook forward/backward prediction errors,
    # same estimator as R's burg.c): f[t] valid for t >= p, b[t-1] pairs it.
    f = x.copy()
    b = x.copy()
    var1 = np.empty(order_max + 1)
    var1[0] = float(x @ x) / n
    coefs = []  # coefs[p-1] = AR coefficients of order-p model
    a = np.zeros(0)
    for p in range(1, order_max + 1):
        fp = f[p:]
        bp = b[p - 1 : n - 1]
        num = float(fp @ bp)
        den = float(fp @ fp) + float(bp @ bp)
        k = 2.0 * num / den if den != 0.0 else 0.0
        new_a = np.empty(p)
        new_a[p - 1] = k
        if p > 1:
            new_a[: p - 1] = a - k * a[::-1]
        a = new_a
        coefs.append(a.copy())
        var1[p] = var1[p - 1] * (1.0 - k * k)
        f_new = fp - k * bp
        b_new = bp - k * fp
        f[p:] = f_new
        b[p:] = b_new  # b_p[t] = b_{p-1}[t-1] - k f_{p-1}[t], t = p..n-1
    aic = n * np.log(var1) + 2.0 * np.arange(order_max + 1) + 2.0 * float(demean)
    order = int(np.argmin(aic))
    ar = coefs[order - 1] if order > 0 else np.zeros(0)
    var_pred = var1[order] * n / (n - (order + 1))
    return order, ar, var_pred


def spec_ar_burg(x: np.ndarray, n_freq: int, xfreq: float = 1.0) -> np.ndarray:
    """stats::spec.ar(method='burg')$spec on freq grid seq(0,.5,len=n_freq)."""
    order, ar, var_pred = burg_ar(x)
    if order >= 1 and n_freq >= 2:
        # spec(f) = var_pred / |1 - Σ_k ar_k e^{-2πifk}|² on the grid
        # linspace(0, .5, n_freq) — which is exactly the first half of an
        # rfft of length L = 2(n_freq-1), so one small FFT of the padded
        # coefficient vector replaces 2·n_freq·order scalar cos/sin calls
        # (libm cos/sin is the slow path here, ~1µs/element unvectorized).
        L = 2 * (n_freq - 1)
        c = np.zeros(L)
        c[0] = 1.0
        c[1 : order + 1] = -ar  # order ≤ 10·log10(n) << L
        h = np.fft.rfft(c)
        spec = var_pred / (xfreq * (h.real * h.real + h.imag * h.imag))
    elif order >= 1:
        # n_freq == 1: single frequency 0 — evaluate directly
        spec = np.full(1, var_pred / (xfreq * (1.0 - ar.sum()) ** 2))
    else:
        spec = np.full(n_freq, var_pred / xfreq)
    return spec


def feat_spectral(x, period: int = 1) -> dict:
    """features.R:528-545 — Shannon entropy of the normalized AR spectrum."""
    x = np.asarray(x, dtype=np.float64)
    if np.all(x == x[0]):
        return {"spectral_entropy": NAN}
    n = x.size
    try:
        xc = na_contiguous(x)
        spec = spec_ar_burg(xc, n_freq=int(math.ceil(n / 2 + 1)), xfreq=float(period))
    except Exception:
        return {"spectral_entropy": NAN}
    fx = np.concatenate([spec[1:][::-1], spec]) / n
    fx = fx / fx.sum()
    prior = 1.0 / fx.size
    fx = 0.999 * fx + 0.001 * prior
    entropy = min(1.0, float(-np.sum(fx * np.log(fx) / math.log(n))))
    return {"spectral_entropy": entropy}
