"""R-compatible math primitives, hand-built in numpy (no scipy available).

Provides the handful of special functions / optimizers the reference
delegates to R internals:
  - chi2_sf        : 1 - pchisq(q, df)  (regularized upper incomplete gamma)
  - brent_fmin     : stats::optimise    (Brent's fmin, Netlib fmin.f port)
  - bw_nrd0        : stats::bw.nrd0     (Silverman's rule-of-thumb bandwidth)
  - r_cut_codes    : base::cut(x, breaks=k, labels=FALSE) bin codes
  - rle            : base::rle run-length encoding
  - ortho_poly_basis: stats::poly(1:n, 2) orthonormal basis columns
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Incomplete gamma / chi-square survival function
# ---------------------------------------------------------------------------

_LANCZOS_G = 7
_LANCZOS_C = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)


def gammaln(x: float) -> float:
    """log |Gamma(x)| for x > 0 via Lanczos approximation."""
    if x < 0.5:
        # reflection formula
        return math.log(math.pi / abs(math.sin(math.pi * x))) - gammaln(1.0 - x)
    x -= 1.0
    a = _LANCZOS_C[0]
    t = x + _LANCZOS_G + 0.5
    for i in range(1, _LANCZOS_G + 2):
        a += _LANCZOS_C[i] / (x + i)
    return 0.5 * math.log(2.0 * math.pi) + (x + 0.5) * math.log(t) - t + math.log(a)


def _gser(a: float, x: float, itmax: int = 500, eps: float = 3e-14) -> float:
    """Lower regularized incomplete gamma P(a, x) by series (x < a+1)."""
    if x <= 0.0:
        return 0.0
    ap = a
    summ = 1.0 / a
    delt = summ
    for _ in range(itmax):
        ap += 1.0
        delt *= x / ap
        summ += delt
        if abs(delt) < abs(summ) * eps:
            break
    return summ * math.exp(-x + a * math.log(x) - gammaln(a))


def _gcf(a: float, x: float, itmax: int = 500, eps: float = 3e-14) -> float:
    """Upper regularized incomplete gamma Q(a, x) by continued fraction."""
    fpmin = 1e-300
    b = x + 1.0 - a
    c = 1.0 / fpmin
    d = 1.0 / b
    h = d
    for i in range(1, itmax + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < fpmin:
            d = fpmin
        c = b + an / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < eps:
            break
    return math.exp(-x + a * math.log(x) - gammaln(a)) * h


def gammainc_upper(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0.0 or a <= 0.0:
        return float("nan")
    if x == 0.0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gser(a, x)
    return _gcf(a, x)


def chi2_sf(q: float, df: float) -> float:
    """Survival function of the chi-square distribution: 1 - pchisq(q, df)."""
    if df <= 0:
        return float("nan")
    if q <= 0:
        return 1.0
    return gammainc_upper(df / 2.0, q / 2.0)


def norm_pdf(x, mean=0.0, sd=1.0):
    """stats::dnorm."""
    x = np.asarray(x, dtype=np.float64)
    z = (x - mean) / sd
    return np.exp(-0.5 * z * z) / (sd * math.sqrt(2.0 * math.pi))


# ---------------------------------------------------------------------------
# Brent's fmin — exact port of the algorithm behind stats::optimise
# (Netlib fmin.f / R src/library/stats/src/optimize.c Brent_fmin)
# ---------------------------------------------------------------------------

def brent_fmin(f, lower: float, upper: float, tol: float | None = None) -> float:
    """Minimize f on [lower, upper]; returns argmin like optimise()$minimum.

    Reference use: guerrero.R:42-45 (`optimise(lambda_coef_var, c(lower,
    upper), ...)`) with R's default tol = .Machine$double.eps^0.25.
    """
    if tol is None:
        tol = 2.220446049250313e-16 ** 0.25
    c = (3.0 - math.sqrt(5.0)) * 0.5
    eps = math.sqrt(2.220446049250313e-16)
    a, b = lower, upper
    v = w = x = a + c * (b - a)
    d = e = 0.0
    fv = fw = fx = f(x)
    tol3 = tol / 3.0
    while True:
        xm = 0.5 * (a + b)
        tol1 = eps * abs(x) + tol3
        t2 = 2.0 * tol1
        if abs(x - xm) <= t2 - 0.5 * (b - a):
            break
        p = q = r = 0.0
        if abs(e) > tol1:
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0.0:
                p = -p
            else:
                q = -q
            r = e
            e = d
        if abs(p) >= abs(0.5 * q * r) or p <= q * (a - x) or p >= q * (b - x):
            # golden-section step
            if x < xm:
                e = b - x
            else:
                e = a - x
            d = c * e
        else:
            # parabolic-interpolation step
            d = p / q
            u = x + d
            if u - a < t2 or b - u < t2:
                d = tol1 if xm - x >= 0 else -tol1
        if abs(d) >= tol1:
            u = x + d
        else:
            u = x + (tol1 if d >= 0 else -tol1)
        fu = f(u)
        if fu <= fx:
            if u < x:
                b = x
            else:
                a = x
            v, fv = w, fw
            w, fw = x, fx
            x, fx = u, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, fv = w, fw
                w, fw = u, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
    return x


# ---------------------------------------------------------------------------
# Misc R helpers
# ---------------------------------------------------------------------------

def bw_nrd0(x: np.ndarray) -> float:
    """stats::bw.nrd0 — Silverman's rule-of-thumb bandwidth.

    Reference use: features.R:457 (shift_kl_max).
    """
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = x.size
    if n < 2:
        raise ValueError("need at least 2 data points")
    hi = float(np.std(x, ddof=1))
    # IQR with quantile type 7 (numpy default 'linear' interpolation)
    q75, q25 = np.percentile(x, [75.0, 25.0])
    lo = min(hi, (q75 - q25) / 1.349)
    if lo == 0.0:
        lo = hi or abs(float(x[0])) or 1.0
    return 0.9 * lo * n ** (-0.2)


def r_cut_codes(x: np.ndarray, breaks: int = 10) -> np.ndarray:
    """base::cut(x, breaks=k, include.lowest=TRUE, labels=FALSE).

    Equal-width bins over range(x), with the outermost edges extended by
    diff(range)/1000 exactly as base R does. Returns 1-based bin codes
    (NaN input -> 0 placeholder).
    """
    x = np.asarray(x, dtype=np.float64)
    ok = ~np.isnan(x)
    rng_lo, rng_hi = np.min(x[ok]), np.max(x[ok])
    dx = rng_hi - rng_lo
    if dx == 0:
        edges = np.linspace(rng_lo - 0.001, rng_hi + 0.001, breaks + 1)
    else:
        edges = np.linspace(rng_lo, rng_hi, breaks + 1)
        edges[0] = rng_lo - dx / 1000.0
        edges[-1] = rng_hi + dx / 1000.0
    # intervals are (edges[i], edges[i+1]]  (right=TRUE)
    codes = np.zeros(x.size, dtype=np.int64)
    codes[ok] = np.searchsorted(edges, x[ok], side="left")
    codes[ok] = np.clip(codes[ok], 1, breaks)
    return codes


def rle(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """base::rle — (lengths, values) of runs of equal values."""
    x = np.asarray(x)
    n = x.size
    if n == 0:
        return np.array([], dtype=np.int64), x
    if x.dtype.kind == "f":
        same = (x[1:] == x[:-1]) | (np.isnan(x[1:]) & np.isnan(x[:-1]))
        change = ~same
    else:
        change = x[1:] != x[:-1]
    idx = np.flatnonzero(change)
    starts = np.concatenate(([0], idx + 1))
    ends = np.concatenate((idx + 1, [n]))
    return (ends - starts).astype(np.int64), x[starts]


def ortho_poly_basis(n: int, degree: int = 2) -> np.ndarray:
    """stats::poly(seq_len(n), degree) orthonormal basis (n x degree).

    Columns are zero-mean, unit-norm, mutually orthogonal, with R's sign
    convention (column 1 increasing; column 2 positive leading coefficient).
    Reference use: features.R:89 (linearity/curvature of the STL trend).
    """
    x = np.arange(1, n + 1, dtype=np.float64)
    xc = x - x.mean()
    cols = []
    prev = [np.ones(n) / math.sqrt(n)]
    for d in range(1, degree + 1):
        v = xc ** d
        for p in prev:
            v = v - (v @ p) * p
        nv = np.linalg.norm(v)
        v = v / nv
        prev.append(v)
        cols.append(v)
    return np.column_stack(cols)


def lm_r_squared(y: np.ndarray, X: np.ndarray) -> float:
    """R^2 of lm(y ~ X) with intercept (centered total sum of squares)."""
    y = np.asarray(y, dtype=np.float64)
    X1 = np.column_stack([np.ones(y.size), X])
    beta, *_ = np.linalg.lstsq(X1, y, rcond=None)
    resid = y - X1 @ beta
    rss = float(resid @ resid)
    tss = float(((y - y.mean()) ** 2).sum())
    if tss == 0.0:
        return float("nan")
    return 1.0 - rss / tss


def r_var(x: np.ndarray) -> float:
    """stats::var with na.rm=TRUE (ddof=1); NaN when fewer than 2 values."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if x.size < 2:
        return float("nan")
    return float(np.var(x, ddof=1))


def r_sd(x: np.ndarray) -> float:
    v = r_var(x)
    return float("nan") if np.isnan(v) else math.sqrt(v)
