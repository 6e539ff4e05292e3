"""X-11-method seasonal decomposition core, from the published algorithm.

The reference's X11()/X_13ARIMA_SEATS() (x11.R:19-91,
x13arimaseats.R:33-140) shell out to the external Census Bureau X-13
Fortran binary via seasonal::seas — an environment this engine documents
as out of scope (SURVEY §2.2 D6). The X-11 *method* itself, however, is
a published algorithm (Shiskin, Young & Musgrave 1967; Ladiray &
Quenneville, "Seasonal Adjustment with the X-11 Method", 2001), and this
module implements its core iteration from that public specification —
no Census code, no regARIMA pre-adjustment, no SEATS:

  B1   T1  = centered MA(period) of y           (trend, 1st pass)
  B2   SI1 = y - T1          (additive)   or  y / T1   (multiplicative)
  B3   S1' = 3x3 MA of SI1 within each cycle position
  B4   S1  = S1' centered by MA(period) of S1'  (seasonal, 1st pass)
  B5   SA1 = y - S1                              (seasonally adjusted)
  B6   T2  = Henderson MA of SA1                 (trend, 2nd pass)
  B7   SI2 = y - T2
  B8   S2' = 3x5 MA of SI2 within each cycle position
  B9   S2  = S2' centered by MA(period) of S2'   (final seasonal)
  B10  SA2 = y - S2                              (final adjusted)
  B11  T3  = Henderson MA of SA2                 (final trend)
  B12  I   = SA2 - T3                            (final irregular)

so y == T3 + S2 + I (additive) / T3 * S2 * I (multiplicative) exactly.

Filter weights are generated, not copied, from their published closed
forms:

  * Henderson (2p+1)-term weights via the classical formula with
    n = p + 2:
      h_j = 315 ((n-1)^2-j^2)(n^2-j^2)((n+1)^2-j^2)(3n^2-16-11j^2)
            / (8 n (n^2-1)(4n^2-1)(4n^2-9)(4n^2-25))
    (reproduces the published 13-term weights 0.24006, 0.21434,
    0.14736, 0.06549, 0.00000, -0.02786, -0.01935).
  * Asymmetric Henderson ends via Musgrave's minimum-revision surrogate
    filters (Musgrave 1964; Doherty 2001): with D = 4 / (pi R^2) and
    only q of the m future points available, the retained weights are
      u_i = w_i + S/n' + (i - ibar) * B * T
      n' = m+q+1, ibar = (q-m)/2, S = sum of dropped w_j,
      T = sum of dropped w_j (j - ibar), B = D / (1 + D n'(n'^2-1)/12)
    (D -> 0 redistributes the dropped mass evenly; D -> inf projects it
    onto the local linear trend). R (the I/C noise-to-slope ratio)
    follows X-11's published per-length constants: 1.0 for H<=9, 3.5
    for H=13, 4.5 for H>=23.
  * Seasonal 3x3 / 3x5 MAs use the composite interior weights
    (1,2,3,2,1)/9 and (1,2,3,3,3,2,1)/15; at series ends, truncated
    weights renormalized to sum 1 (the published X-11 end-weight tables
    differ in the third decimal; this engine uses the renormalized form
    on BOTH execution paths, so the Spark operator and its SQL oracle
    twin agree exactly — documented divergence from the Census tables).
  * The centered MA(period) uses the classical (0.5,1,...,1,0.5)/m
    filter for even m and the plain m-term mean for odd m, truncated and
    renormalized at the ends.

Where the reference restricts X-11 to period 4/12 (x11.R:6-8, a Census
binary constraint), this kernel accepts any period >= 2 (e.g. 7 for
daily series) — the algorithm itself is period-generic.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# Weight generators (closed forms; see module docstring for provenance)
# ---------------------------------------------------------------------------

def henderson_weights(length: int) -> np.ndarray:
    """Symmetric (2p+1)-term Henderson filter weights, j = -p..p."""
    if length < 3 or length % 2 == 0:
        raise ValueError("Henderson length must be odd and >= 3")
    p = length // 2
    n = p + 2
    j = np.arange(-p, p + 1, dtype=np.float64)
    num = (
        315.0
        * ((n - 1) ** 2 - j**2)
        * (n**2 - j**2)
        * ((n + 1) ** 2 - j**2)
        * (3 * n**2 - 16 - 11 * j**2)
    )
    den = (
        8.0
        * n
        * (n**2 - 1)
        * (4 * n**2 - 1)
        * (4 * n**2 - 9)
        * (4 * n**2 - 25)
    )
    return num / den


def _ic_ratio_for(length: int) -> float:
    """X-11's published I/C assumption per Henderson length (Musgrave R)."""
    if length >= 23:
        return 4.5
    if length >= 13:
        return 3.5
    return 1.0


def musgrave_weights(w: np.ndarray, q: int, r_ic: float) -> np.ndarray:
    """Asymmetric surrogate weights u_{-m..q} when only q future points
    of a symmetric (2m+1)-filter w are available (Musgrave 1964)."""
    m = len(w) // 2
    if not 0 <= q < m:
        raise ValueError("need 0 <= q < m")
    d = 4.0 / (math.pi * r_ic**2)
    n_kept = m + q + 1
    ibar = (q - m) / 2.0
    dropped_j = np.arange(q + 1, m + 1, dtype=np.float64)
    dropped_w = w[m + q + 1 :]
    s = float(dropped_w.sum())
    t = float((dropped_w * (dropped_j - ibar)).sum())
    b = d / (1.0 + d * n_kept * (n_kept**2 - 1) / 12.0)
    i = np.arange(-m, q + 1, dtype=np.float64)
    return w[: n_kept] + s / n_kept + (i - ibar) * b * t


def henderson_weight_table(length: int) -> dict[tuple[int, int], np.ndarray]:
    """Weights keyed by (a, b) = (points available left, right), clamped
    to m. Interior (m, m) is symmetric; one-sided shortfall uses
    Musgrave; both-sided (series shorter than the filter) truncates and
    renormalizes. Every returned array is aligned to offsets -m..m with
    zeros outside the retained span and sums to 1."""
    m = length // 2
    w = henderson_weights(length)
    r_ic = _ic_ratio_for(length)
    table: dict[tuple[int, int], np.ndarray] = {}
    for a in range(m + 1):
        for b in range(m + 1):
            full = np.zeros(2 * m + 1)
            if a == m and b == m:
                full[:] = w
            elif a == m and b < m:
                full[: m + b + 1] = musgrave_weights(w, b, r_ic)
            elif b == m and a < m:
                full[m - a :] = musgrave_weights(w, a, r_ic)[::-1]
            else:
                kept = w[m - a : m + b + 1]
                full[m - a : m + b + 1] = kept / kept.sum()
            table[(a, b)] = full
    return table


def default_henderson_length(period: int) -> int:
    """13 for monthly, 5 for quarterly (the X-11 defaults); otherwise the
    next odd length >= period + 2 so the trend filter spans a cycle."""
    if period == 12:
        return 13
    if period == 4:
        return 5
    h = period + 2
    return h if h % 2 == 1 else h + 1


# ---------------------------------------------------------------------------
# Building-block moving averages (truncated + renormalized at the ends)
# ---------------------------------------------------------------------------

def _centered_ma(x: np.ndarray, m: int) -> np.ndarray:
    """Classical centered MA(m): (0.5,1,..,1,0.5)/m for even m, plain
    mean for odd m; ends renormalize over the available span. NaNs in x
    are skipped (renormalized away), matching AVG-ignores-NULL SQL."""
    n = x.size
    half = m // 2
    if m % 2 == 0:
        w = np.full(m + 1, 1.0)
        w[0] = w[-1] = 0.5
    else:
        w = np.full(m, 1.0)
    out = np.empty(n)
    for i in range(n):
        lo = max(0, i - half)
        hi = min(n, i + half + 1)
        seg = x[lo:hi]
        ww = w[lo - (i - half) : len(w) - ((i + half + 1) - hi)]
        ok = ~np.isnan(seg)
        tot = float((ww * ok).sum())
        out[i] = float((ww[ok] * seg[ok]).sum()) / tot if tot else np.nan
    return out


def _seasonal_ma(x: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Weighted MA with truncated-renormalized ends over one cycle-position
    subseries. NaNs skipped with their weight renormalized away."""
    n = x.size
    half = len(weights) // 2
    out = np.empty(n)
    for i in range(n):
        lo = max(0, i - half)
        hi = min(n, i + half + 1)
        seg = x[lo:hi]
        ww = weights[lo - (i - half) : len(weights) - ((i + half + 1) - hi)]
        ok = ~np.isnan(seg)
        tot = float((ww * ok).sum())
        out[i] = float((ww[ok] * seg[ok]).sum()) / tot if tot else np.nan
    return out


def _henderson_apply(x: np.ndarray, length: int) -> np.ndarray:
    """Henderson trend with Musgrave asymmetric ends (table above)."""
    n = x.size
    m = length // 2
    table = henderson_weight_table(length)
    out = np.empty(n)
    for i in range(n):
        a = min(i, m)
        b = min(n - 1 - i, m)
        w = table[(a, b)]
        lo, hi = i - m, i + m + 1
        clo, chi = max(0, lo), min(n, hi)
        seg = x[clo:chi]
        ww = w[clo - lo : (2 * m + 1) - (hi - chi)]
        ok = ~np.isnan(seg)
        tot = float((ww * ok).sum())
        out[i] = float((ww[ok] * seg[ok]).sum()) / tot if tot else np.nan
    return out


S33 = np.array([1, 2, 3, 2, 1], dtype=np.float64) / 9.0
S35 = np.array([1, 2, 3, 3, 3, 2, 1], dtype=np.float64) / 15.0


# ---------------------------------------------------------------------------
# The decomposition
# ---------------------------------------------------------------------------

def x11_decompose_kernel(
    y: np.ndarray,
    period: int,
    type: str = "additive",
    henderson: int | None = None,
) -> dict[str, np.ndarray]:
    """X-11 core decomposition (module docstring steps B1-B12).

    Returns trend, seasonal, irregular, season_adjust; the components
    reconstruct y exactly (additive sum / multiplicative product)."""
    if type not in ("additive", "multiplicative"):
        raise ValueError(type)
    y = np.asarray(y, dtype=np.float64)
    m = int(period)
    if m < 2:
        raise ValueError("period must be >= 2")
    n = y.size
    if n < 2 * m:
        raise ValueError("series shorter than two cycles")
    if type == "multiplicative" and np.any(y <= 0):
        raise ValueError("multiplicative X-11 needs strictly positive data")
    h = int(henderson) if henderson else default_henderson_length(m)
    mul = type == "multiplicative"

    def detrend(vals: np.ndarray, tr: np.ndarray) -> np.ndarray:
        return vals / tr if mul else vals - tr

    def seasonal_pass(si: np.ndarray, weights: np.ndarray) -> np.ndarray:
        s_raw = np.empty(n)
        for pos in range(m):
            s_raw[pos::m] = _seasonal_ma(si[pos::m], weights)
        center = _centered_ma(s_raw, m)
        return s_raw / center if mul else s_raw - center

    t1 = _centered_ma(y, m)
    s1 = seasonal_pass(detrend(y, t1), S33)
    sa1 = y / s1 if mul else y - s1
    t2 = _henderson_apply(sa1, h)
    s2 = seasonal_pass(detrend(y, t2), S35)
    sa2 = y / s2 if mul else y - s2
    t3 = _henderson_apply(sa2, h)
    irr = sa2 / t3 if mul else sa2 - t3
    return {
        "trend": t3,
        "seasonal": s2,
        "irregular": irr,
        "season_adjust": sa2,
    }
