"""STL decomposition and SuperSmoother, R-exact, in numpy.

r_stl() reproduces stats::stl (the Cleveland et al. 1990 Fortran stl.f:
inner loop of cycle-subseries loess + low-pass MA/loess + trend loess,
with jump-point evaluation and linear interpolation). Parameter defaults
match the R wrapper exactly:
    t.window = nextodd(ceiling(1.5*period / (1 - 1.5/s.window)))
    l.window = nextodd(period); degrees s=0, t=1, l=t; jumps = ceiling(w/10)
    robust=FALSE -> inner=2, outer=0
    s.window="periodic" -> s.window = 10*n+1, s.degree=0, and the seasonal
    is replaced by cycle-position means post-fit.

supsmu() reproduces stats::supsmu (Friedman's SuperSmoother, supsmu.f):
cross-validated span selection among (0.05, 0.2, 0.5) with running
local-linear smoothers.

estimate_stl() is the feasts MSTL wrapper (reference stl.R:50-86):
iterated per-season STL extraction; non-seasonal series fall back to
supsmu trend.
"""

from __future__ import annotations

import math

import numpy as np


def nextodd(x: float) -> int:
    x = int(round(x))
    return x + 1 if x % 2 == 0 else x


# ---------------------------------------------------------------------------
# Loess smoother from stl.f (stlest / stless) — local linear/constant fit
# with tricube weights over a sliding window, evaluated every `jump` points
# and linearly interpolated between.
# ---------------------------------------------------------------------------

def _stl_est(y: np.ndarray, n: int, length: int, ideg: int, xs: float,
             nleft: int, nright: int) -> float:
    """stl.f stlest — weighted fit at position xs over [nleft, nright] (1-based)."""
    rng = n - 1.0
    h = max(xs - nleft, nright - xs)
    if length > n:
        # Fortran stl.f: h = h + float((len-n)/2) — INTEGER division, then
        # float. Validated bit-for-bit against the fdeaths feat_stl goldens
        # (real division 2.5 instead of 2 shifts curvature by 6%).
        h += (length - n) // 2
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1, dtype=np.float64)
    r = np.abs(j - xs)
    w = np.zeros(j.size)
    inside = r <= h9
    small = r <= h1
    mid = inside & ~small
    w[small] = 1.0
    if h > 0:
        w[mid] = (1.0 - (r[mid] / h) ** 3) ** 3
    a = w.sum()
    if a <= 0.0:
        return math.nan
    w /= a
    if h > 0.0 and ideg > 0:
        aw = float(w @ j)
        b = xs - aw
        c = float(w @ (j - aw) ** 2)
        if math.sqrt(c) > 0.001 * rng:
            b = b / c
            w = w * (b * (j - aw) + 1.0)
    return float(w @ y[nleft - 1 : nright])


def _loess_weight_row(n: int, length: int, ideg: int, xs: float,
                      nleft: int, nright: int) -> np.ndarray | None:
    """The weight vector of _stl_est (value = w @ y[nleft-1:nright]).

    The weights depend only on positions, never on y (the degree-1
    adjustment is a linear reweighting), so rows are cacheable and whole
    smoother passes become matrix products. Returns None when total weight
    is <= 0 (the `not ok` path)."""
    rng = n - 1.0
    h = max(xs - nleft, nright - xs)
    if length > n:
        h += (length - n) // 2  # integer division — see _stl_est
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1, dtype=np.float64)
    r = np.abs(j - xs)
    w = np.zeros(j.size)
    inside = r <= h9
    small = r <= h1
    mid = inside & ~small
    w[small] = 1.0
    if h > 0:
        w[mid] = (1.0 - (r[mid] / h) ** 3) ** 3
    a = w.sum()
    if a <= 0.0:
        return None
    w /= a
    if h > 0.0 and ideg > 0:
        aw = float(w @ j)
        b = xs - aw
        c = float(w @ (j - aw) ** 2)
        if math.sqrt(c) > 0.001 * rng:
            b = b / c
            w = w * (b * (j - aw) + 1.0)
    return w


# cache: (n, length, ideg) -> full-series weight matrix spec
_ESS_CACHE: dict = {}
_ESS_CACHE_MAX = 256


def _ess_weights(n: int, length: int, ideg: int) -> tuple:
    """Per-evaluation-point (nleft, weights) for stless on an n-point
    series, exactly reproducing the Fortran window placement. Returns
    (nlefts int[n], W float[n, window]) where window = min(length, n)."""
    key = (n, length, ideg)
    hit = _ESS_CACHE.get(key)
    if hit is not None:
        return hit
    win = min(length, n)
    nlefts = np.empty(n, dtype=np.int64)
    W = np.empty((n, win))
    if length >= n:
        for i in range(1, n + 1):
            nlefts[i - 1] = 1
            w = _loess_weight_row(n, length, ideg, float(i), 1, n)
            W[i - 1] = 0.0 if w is None else w
    else:
        # Sliding-window case: for interior points (nsh <= i <= n-nsh) the
        # window offsets j-xs, the bandwidth h, and the degree-1 reweighting
        # are all shift-invariant, so ONE weight row serves every interior
        # point — only the <length boundary rows differ. This turns the
        # O(n) python loop into O(length) (a 1000x call reduction for long
        # series; bitwise-identical rows, verified against the looped form).
        nsh = (length + 1) // 2
        for i in range(1, min(nsh, n + 1)):
            nlefts[i - 1] = 1
            w = _loess_weight_row(n, length, ideg, float(i), 1, length)
            W[i - 1] = 0.0 if w is None else w
        for i in range(max(n - nsh + 1, 1), n + 1):
            nlefts[i - 1] = n - length + 1
            w = _loess_weight_row(n, length, ideg, float(i), n - length + 1, n)
            W[i - 1] = 0.0 if w is None else w
        lo, hi = nsh, n - nsh  # inclusive interior 1-based range
        if lo <= hi:
            i = lo
            w = _loess_weight_row(n, length, ideg, float(i), i - nsh + 1,
                                  length + i - nsh)
            row = 0.0 if w is None else w
            W[lo - 1 : hi] = row
            nlefts[lo - 1 : hi] = np.arange(lo, hi + 1) - nsh + 1
    if len(_ESS_CACHE) >= _ESS_CACHE_MAX:
        _ESS_CACHE.clear()
    _ESS_CACHE[key] = (nlefts, W)
    return nlefts, W


def _jump_interpolate(ys: np.ndarray, n: int, newnj: int) -> None:
    """stless tail: linear interpolation between jump evaluation points.
    ys must already hold values at 1, 1+nj, ... and at n. Vectorized over
    the segment starts (the per-offset inner loop runs newnj-1 times on
    whole arrays instead of n python iterations)."""
    starts = np.arange(0, n - newnj, newnj)  # 0-based segment starts
    if starts.size:
        delta = (ys[starts + newnj] - ys[starts]) / newnj
        base = ys[starts].copy()
        for off in range(1, newnj):
            ys[starts + off] = base + delta * off
    k = ((n - 1) // newnj) * newnj + 1
    if k != n and k != n - 1:
        delta = (ys[n - 1] - ys[k - 1]) / (n - k)
        js = np.arange(k + 1, n)
        ys[js - 1] = ys[k - 1] + delta * (js - k)


def _stl_ess(y: np.ndarray, length: int, ideg: int, njump: int) -> np.ndarray:
    """stl.f stless — vectorized: position-only weight rows turn the whole
    pass into gathers + dot products; jump evaluation + linear interpolation
    reproduced exactly (including the final point's stale-window estimate,
    which for the jumped sliding case is always the rightmost window)."""
    n = y.size
    ys = np.empty(n)
    if n < 2:
        ys[:] = y[0]
        return ys
    newnj = min(njump, n - 1)
    nlefts, W = _ess_weights(n, length, ideg)
    win = W.shape[1]
    if newnj == 1:
        idx = np.arange(n)
    else:
        idx = np.arange(0, n, newnj)
        if idx[-1] != n - 1:
            idx = np.concatenate([idx, [n - 1]])
    # gather windows and dot with weight rows
    offs = nlefts[idx] - 1
    gather = offs[:, None] + np.arange(win)[None, :]
    vals = np.einsum("ij,ij->i", W[idx], y[gather])
    # `not ok` fallback (all-zero row) -> y value
    zero_rows = ~W[idx].any(axis=1)
    if zero_rows.any():
        vals = np.where(zero_rows, y[idx], vals)
    ys[idx] = vals
    if newnj != 1:
        _jump_interpolate(ys, n, newnj)
    return ys


def _stl_ma(x: np.ndarray, length: int) -> np.ndarray:
    """stl.f stlma — simple moving average, output length n-length+1."""
    c = np.cumsum(np.concatenate(([0.0], x)))
    return (c[length:] - c[:-length]) / length


def _stl_fts(x: np.ndarray, np_: int) -> np.ndarray:
    """stl.f stlfts — MA(p), MA(p), MA(3); len n+2p -> n."""
    t = _stl_ma(x, np_)
    t = _stl_ma(t, np_)
    t = _stl_ma(t, 3)
    return t


_EXT_CACHE: dict = {}


def _ext_weight_rows(k: int, ns: int, isdeg: int) -> tuple:
    """Backcast (xs=0) and forecast (xs=k+1) weight rows for a k-point
    subseries (stlss extension fits)."""
    key = (k, ns, isdeg)
    hit = _EXT_CACHE.get(key)
    if hit is not None:
        return hit
    nright = min(ns, k)
    w0 = _loess_weight_row(k, ns, isdeg, 0.0, 1, nright)
    nleft = max(1, k - ns + 1)
    w1 = _loess_weight_row(k, ns, isdeg, float(k + 1), nleft, k)
    out = (nright, w0, nleft, w1)
    if len(_EXT_CACHE) >= _ESS_CACHE_MAX:
        _EXT_CACHE.clear()
    _EXT_CACHE[key] = out
    return out


def _stl_ss(y: np.ndarray, np_: int, ns: int, isdeg: int, nsjump: int) -> np.ndarray:
    """stl.f stlss — cycle-subseries smoothing, extended 1 period each side.

    Vectorized across equal-length subseries: all subseries of length k
    share the same weight matrix, so the smoothing of the whole cycle block
    is one (n_eval x k) @ (k x count) product. Returns length n + 2*np_
    with the season((m-1)*np_+j) interleaved layout.
    """
    n = y.size
    season = np.empty(n + 2 * np_)
    # group cycle positions by subseries length (at most 2 distinct lengths)
    by_len: dict[int, list[int]] = {}
    for j in range(1, np_ + 1):
        k = (n - j) // np_ + 1
        by_len.setdefault(k, []).append(j)
    for k, js in by_len.items():
        subs = np.empty((k, len(js)))
        for c, j in enumerate(js):
            subs[:, c] = y[j - 1 :: np_][:k]
        if k < 2:
            sm_all = subs.copy()
        else:
            newnj = min(nsjump, k - 1)
            nlefts, W = _ess_weights(k, ns, isdeg)
            win = W.shape[1]
            if newnj == 1:
                idx = np.arange(k)
            else:
                idx = np.arange(0, k, newnj)
                if idx[-1] != k - 1:
                    idx = np.concatenate([idx, [k - 1]])
            offs = nlefts[idx] - 1
            gather = offs[:, None] + np.arange(win)[None, :]
            # (n_eval, win) rows applied to every subseries column at once
            vals = np.einsum("ew,ewc->ec", W[idx], subs[gather])
            zero_rows = ~W[idx].any(axis=1)
            sm_all = np.empty((k, len(js)))
            sm_all[idx] = np.where(zero_rows[:, None], subs[idx], vals)
            if newnj != 1:
                for c in range(len(js)):
                    col = sm_all[:, c]
                    _jump_interpolate(col, k, newnj)
                    sm_all[:, c] = col
        nright, w0, nleft, w1 = _ext_weight_rows(k, ns, isdeg)
        v0 = (w0 @ subs[:nright]) if w0 is not None else sm_all[0]
        v1 = (w1 @ subs[nleft - 1 : k]) if w1 is not None else sm_all[k - 1]
        for c, j in enumerate(js):
            season[j - 1 :: np_][0] = v0[c] if np.ndim(v0) else v0
            season[j - 1 + np_ :: np_][:k] = sm_all[:, c]
            season[j - 1 :: np_][k + 1] = v1[c] if np.ndim(v1) else v1
    return season


def r_stl(
    y: np.ndarray,
    period: int,
    s_window,
    s_degree: int = 0,
    t_window: int | None = None,
    t_degree: int = 1,
    l_window: int | None = None,
    l_degree: int | None = None,
    s_jump: int | None = None,
    t_jump: int | None = None,
    l_jump: int | None = None,
    robust: bool = False,
    inner: int | None = None,
    outer: int | None = None,
) -> dict:
    """stats::stl(ts(y, frequency=period), s.window=...) — returns dict of
    seasonal/trend/remainder arrays.

    Robustness iterations (outer>0) use the bisquare weights of stl.f stlrwt.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if period < 2 or n <= 2 * period:
        raise ValueError("series is not periodic or has less than two periods")
    periodic = False
    if isinstance(s_window, str):
        if not "periodic".startswith(s_window):
            raise ValueError("unknown string value for s.window")
        periodic = True
        s_window = 10 * n + 1
        s_degree = 0
    if t_window is None:
        t_window = nextodd(math.ceil(1.5 * period / (1.0 - 1.5 / s_window)))
    if l_window is None:
        l_window = nextodd(period)
    if l_degree is None:
        l_degree = t_degree
    if s_jump is None:
        s_jump = math.ceil(s_window / 10.0)
    if t_jump is None:
        t_jump = math.ceil(t_window / 10.0)
    if l_jump is None:
        l_jump = math.ceil(l_window / 10.0)
    if inner is None:
        inner = 1 if robust else 2
    if outer is None:
        outer = 15 if robust else 0

    # Fortran stl() forces odd >= 3 windows and period >= 2
    ns = max(3, int(s_window))
    ns += ns % 2 == 0
    nt = max(3, int(t_window))
    nt += nt % 2 == 0
    nl = max(3, int(l_window))
    nl += nl % 2 == 0
    np_ = max(2, int(period))

    trend = np.zeros(n)
    season = np.zeros(n)
    rw = np.ones(n)
    use_rw = False
    for it in range(outer + 1):
        # stlstp inner loop
        for _ in range(inner):
            detrended = y - trend
            if use_rw:
                # robustness weights enter the subseries + trend loess fits;
                # implemented by weighting y values (stl.f passes rw through
                # stlest's userw path: w_j *= rw_j before normalization)
                c_ext = _stl_ss_weighted(detrended, np_, ns, s_degree, int(s_jump), rw)
            else:
                c_ext = _stl_ss(detrended, np_, ns, s_degree, int(s_jump))
            low = _stl_fts(c_ext, np_)
            low = _stl_ess(low, nl, l_degree, int(l_jump))
            season = c_ext[np_ : np_ + n] - low
            deseason = y - season
            if use_rw:
                trend = _stl_ess_weighted(deseason, nt, t_degree, int(t_jump), rw)
            else:
                trend = _stl_ess(deseason, nt, t_degree, int(t_jump))
        if it < outer:
            # stlrwt: bisquare robustness weights from remainder
            fit = trend + season
            r = np.abs(y - fit)
            mid = np.sort(r)
            m1 = mid[(n + 1) // 2 - 1]
            m2 = mid[n - (n + 1) // 2]
            cmad = 3.0 * (m1 + m2)
            c9 = 0.999 * cmad
            c1 = 0.001 * cmad
            rw = np.where(
                r <= c1, 1.0, np.where(r >= c9, 0.0, (1.0 - (r / cmad) ** 2) ** 2)
            )
            use_rw = True

    if periodic:
        # R stl wrapper: seasonal <- cycle-position means
        cyc = np.arange(n) % np_
        means = np.array([season[cyc == c].mean() for c in range(np_)])
        season = means[cyc]
    remainder = y - season - trend
    return {"seasonal": season, "trend": trend, "remainder": remainder}


def _weighted_variant(fn):
    """Weighted variants of the loess passes for the robust path."""
    return fn


def _stl_est_w(y, n, length, ideg, xs, nleft, nright, rw):
    rng = n - 1.0
    h = max(xs - nleft, nright - xs)
    if length > n:
        h += (length - n) // 2  # integer division (see _stl_est)
    h9, h1 = 0.999 * h, 0.001 * h
    j = np.arange(nleft, nright + 1, dtype=np.float64)
    r = np.abs(j - xs)
    w = np.zeros(j.size)
    inside = r <= h9
    small = r <= h1
    mid = inside & ~small
    w[small] = 1.0
    if h > 0:
        w[mid] = (1.0 - (r[mid] / h) ** 3) ** 3
    w *= rw[nleft - 1 : nright]
    a = w.sum()
    if a <= 0.0:
        return math.nan
    w /= a
    if h > 0.0 and ideg > 0:
        aw = float(w @ j)
        b = xs - aw
        c = float(w @ (j - aw) ** 2)
        if math.sqrt(c) > 0.001 * rng:
            b = b / c
            w = w * (b * (j - aw) + 1.0)
    return float(w @ y[nleft - 1 : nright])


def _stl_ess_weighted(y, length, ideg, njump, rw):
    n = y.size
    ys = np.empty(n)
    if n < 2:
        ys[:] = y[0]
        return ys
    newnj = min(njump, n - 1)
    nsh = (length + 1) // 2
    for i in range(1, n + 1, newnj):
        if length >= n:
            nleft, nright = 1, n
        elif i < nsh:
            nleft, nright = 1, length
        elif i >= n - nsh + 1:
            nleft, nright = n - length + 1, n
        else:
            nleft, nright = i - nsh + 1, length + i - nsh
        v = _stl_est_w(y, n, length, ideg, float(i), nleft, nright, rw)
        ys[i - 1] = y[i - 1] if math.isnan(v) else v
    if newnj != 1:
        for i in range(1, n - newnj + 1, newnj):
            delta = (ys[i + newnj - 1] - ys[i - 1]) / newnj
            for j in range(i + 1, i + newnj):
                ys[j - 1] = ys[i - 1] + delta * (j - i)
        k = ((n - 1) // newnj) * newnj + 1
        if k != n:
            if length >= n:
                nleft, nright = 1, n
            else:
                nleft, nright = n - length + 1, n
            v = _stl_est_w(y, n, length, ideg, float(n), nleft, nright, rw)
            ys[n - 1] = y[n - 1] if math.isnan(v) else v
            if k != n - 1:
                delta = (ys[n - 1] - ys[k - 1]) / (n - k)
                for j in range(k + 1, n):
                    ys[j - 1] = ys[k - 1] + delta * (j - k)
    return ys


def _stl_ss_weighted(y, np_, ns, isdeg, nsjump, rw):
    n = y.size
    season = np.empty(n + 2 * np_)
    for j in range(1, np_ + 1):
        k = (n - j) // np_ + 1
        sub = y[j - 1 :: np_][:k]
        subrw = rw[j - 1 :: np_][:k]
        sm = _stl_ess_weighted(sub, ns, isdeg, nsjump, subrw)
        nright = min(ns, k)
        v0 = _stl_est_w(sub, k, ns, isdeg, 0.0, 1, nright, subrw)
        if math.isnan(v0):
            v0 = sm[0]
        nleft = max(1, k - ns + 1)
        v1 = _stl_est_w(sub, k, ns, isdeg, float(k + 1), nleft, k, subrw)
        if math.isnan(v1):
            v1 = sm[k - 1]
        season[j - 1 :: np_][: k + 2] = np.concatenate(([v0], sm, [v1]))
    return season


# ---------------------------------------------------------------------------
# SuperSmoother (Friedman 1984) — stats::supsmu / supsmu.f
# ---------------------------------------------------------------------------

_SPANS = (0.05, 0.2, 0.5)
_SUPSMU_EPS = 1e-3
_SML = 1e-7


def _smooth_pass(x, y, w, span, cross_validate, vsmlsq):
    """supsmu.f `smooth` — running local-linear fit with window span*n.

    Returns (smo, acvr); acvr only meaningful when cross_validate.
    Non-periodic variant (jper=1). Vectorized closed form of the running
    update: at each j the window is [j-ibw, j+ibw] clamped to stay fully
    inside [1, n] (boundary windows don't shrink, they stop sliding).
    """
    n = x.size
    ibw = int(0.5 * span * n + 0.5)
    if ibw < 2:
        ibw = 2
    it = 2 * ibw + 1
    if it >= n:
        lo = np.zeros(n, dtype=np.int64)
        hi = np.full(n, n - 1, dtype=np.int64)
        W = float(n)
    else:
        j = np.arange(n)
        lo = np.clip(j - ibw, 0, n - it)
        hi = lo + it - 1
        W = float(it)
    cx = np.concatenate(([0.0], np.cumsum(x)))
    cy = np.concatenate(([0.0], np.cumsum(y)))
    cxx = np.concatenate(([0.0], np.cumsum(x * x)))
    cxy = np.concatenate(([0.0], np.cumsum(x * y)))
    sx = cx[hi + 1] - cx[lo]
    sy = cy[hi + 1] - cy[lo]
    sxx = cxx[hi + 1] - cxx[lo]
    sxy = cxy[hi + 1] - cxy[lo]
    xm = sx / W
    ym = sy / W
    var = sxx - W * xm * xm
    cvar = sxy - W * xm * ym
    a = np.where(var > vsmlsq, cvar / np.where(var > vsmlsq, var, 1.0), 0.0)
    smo = a * (x - xm) + ym
    acvr = np.zeros(n)
    if cross_validate:
        h = 1.0 / W + np.where(var > vsmlsq, (x - xm) ** 2 / np.where(var > vsmlsq, var, 1.0), 0.0)
        denom = 1.0 - w * h
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = np.abs(y - smo) / denom
        acvr = np.where(denom > 0.0, vals, np.nan)
        # fill non-positive-denominator entries with previous value
        for jj in range(n):
            if np.isnan(acvr[jj]):
                acvr[jj] = acvr[jj - 1] if jj > 0 else 0.0
    return smo, acvr


def supsmu(x: np.ndarray, y: np.ndarray, span: float = 0.0, bass: float = 0.0) -> np.ndarray:
    """stats::supsmu(x, y)$y with equal weights, non-periodic.

    span=0 means cross-validated span selection ("cv", the R default).
    Reference use: stl.R:80 (non-seasonal trend), hence the WWWusage
    feat_stl goldens (test-features.R:64-75).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    w = np.ones(n)
    if x[-1] <= x[0]:
        return np.full(n, y.mean())
    i = n // 4
    j = 3 * i
    # Fortran is 1-based: scale = x(3i) - x(i)
    scale = x[j - 1] - x[i - 1]
    while scale <= 0.0:
        if j < n:
            j += 1
        if i > 1:
            i -= 1
        scale = x[j - 1] - x[i - 1]
    vsmlsq = (_SUPSMU_EPS * scale) ** 2
    if span > 0.0:
        smo, _ = _smooth_pass(x, y, w, span, False, vsmlsq)
        return smo
    # three-span pass with cross-validated residuals
    sc = np.zeros((n, 7))
    for k, sp in enumerate(_SPANS):
        smo_k, acvr = _smooth_pass(x, y, w, sp, True, vsmlsq)
        sc[:, 2 * k] = smo_k
        sc[:, 2 * k + 1], _ = _smooth_pass(x, acvr, w, _SPANS[1], False, vsmlsq)
    # best span per point
    resmin = np.full(n, np.inf)
    best = np.zeros(n)
    for k, sp in enumerate(_SPANS):
        better = sc[:, 2 * k + 1] < resmin
        resmin = np.where(better, sc[:, 2 * k + 1], resmin)
        best = np.where(better, sp, best)
    if 0.0 < bass <= 10.0:
        woofer_res = sc[:, 5]
        adj = (resmin < woofer_res) & (resmin > 0.0)
        frac = np.maximum(_SML, resmin / np.where(woofer_res > 0, woofer_res, 1.0)) ** (10.0 - bass)
        best = np.where(adj, best + (_SPANS[2] - best) * frac, best)
    sm_span, _ = _smooth_pass(x, best, w, _SPANS[1], False, vsmlsq)
    sm_span = np.clip(sm_span, _SPANS[0], _SPANS[2])
    # interpolate between the three smoothed-y columns
    f = sm_span - _SPANS[1]
    interp = np.where(
        f >= 0.0,
        (1.0 - f / (_SPANS[2] - _SPANS[1])) * sc[:, 2]
        + (f / (_SPANS[2] - _SPANS[1])) * sc[:, 4],
        (1.0 + f / (_SPANS[1] - _SPANS[0])) * sc[:, 2]
        + (-f / (_SPANS[1] - _SPANS[0])) * sc[:, 0],
    )
    smo, _ = _smooth_pass(x, interp, w, _SPANS[0], False, vsmlsq)
    return smo


# ---------------------------------------------------------------------------
# MSTL wrapper — feasts estimate_stl (stl.R:50-86)
# ---------------------------------------------------------------------------

def estimate_stl(
    y: np.ndarray,
    periods: list[int] | tuple[int, ...] = (),
    s_windows: list | None = None,
    period_names: list[str] | None = None,
    iterations: int = 2,
    **stl_kwargs,
) -> dict:
    """feasts estimate_stl: iterated multi-seasonal STL; supsmu fallback.

    Returns {"trend": arr, "season_<name>": arr..., "remainder": arr,
    "season_adjust": arr}. Seasons with period <= 1 are dropped; default
    s.window per season is 7 + 4*rank (11, 15, 19, ...); seasons are
    processed in ascending period order (stl.R:56-63).
    """
    y = np.asarray(y, dtype=np.float64)
    if np.isnan(y).any():
        raise ValueError("STL decomposition does not support series with missing values.")
    n = y.size
    periods = [int(p) for p in periods]
    if period_names is None:
        period_names = [str(p) for p in periods]
    if s_windows is None:
        s_windows = [None] * len(periods)
    keep = [i for i, p in enumerate(periods) if p > 1]
    periods = [periods[i] for i in keep]
    period_names = [period_names[i] for i in keep]
    s_windows = [s_windows[i] for i in keep]
    # default s.window at position i = 7 + 4*order(period)[i] — note R uses
    # order() (the sorting permutation), not rank(); reproduced verbatim
    # (stl.R:58-62). For distinct ascending-ranked inputs this is 11,15,19...
    order_perm = np.argsort(np.array(periods, dtype=np.float64), kind="stable")
    s_windows = [
        sw if sw is not None else 7 + 4 * (int(o) + 1)
        for sw, o in zip(s_windows, order_perm)
    ]
    sort_idx = np.argsort(np.array(periods), kind="stable")
    periods = [periods[i] for i in sort_idx]
    period_names = [period_names[i] for i in sort_idx]
    s_windows = [s_windows[i] for i in sort_idx]

    deseas = y.copy()
    seas = [np.zeros(n) for _ in periods]
    if periods:
        fit = None
        for _ in range(iterations):
            for i, (p, sw) in enumerate(zip(periods, s_windows)):
                deseas = deseas + seas[i]
                fit = r_stl(deseas, period=p, s_window=sw, **stl_kwargs)
                seas[i] = fit["seasonal"]
                deseas = deseas - seas[i]
        trend = fit["trend"]
    else:
        trend = supsmu(np.arange(1, n + 1, dtype=np.float64), y)
    out = {"trend": trend}
    for name, s in zip(period_names, seas):
        out[f"season_{name}"] = s
    out["remainder"] = deseas - trend
    out["season_adjust"] = deseas
    return out
