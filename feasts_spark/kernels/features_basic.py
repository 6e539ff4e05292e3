"""Scalar-per-series feature kernels F1-F3, F8-F13, F15 (SURVEY.md §2.1).

Each function reproduces the same-named feasts feature exactly and returns
a dict of feature-name -> float (NaN plays R's NA). Reference citations are
to /root/reference/R/features.R and guerrero.R.
"""

from __future__ import annotations

import math
import warnings

import numpy as np
import pandas as pd

from feasts_spark.kernels.rmath import (
    brent_fmin,
    bw_nrd0,
    lm_r_squared,
    norm_pdf,
    r_cut_codes,
    r_sd,
    r_var,
    rle,
)

NAN = float("nan")


def _default_size(size: int | None, period: int) -> int:
    """features.R:396-398 — window defaults to 10 when period==1 else period."""
    if size is not None:
        return size
    return 10 if period == 1 else period


def n_crossing_points(x: np.ndarray) -> dict:
    """features.R:4-13 — median midline crossings."""
    x = np.asarray(x, dtype=np.float64)
    mid = np.nanmedian(x)
    ab = x <= mid  # NaN <= mid is False, matching R NA handled by na.rm sum
    nan_mask = np.isnan(x)
    p1, p2 = ab[:-1], ab[1:]
    cross = (p1 & ~p2) | (p2 & ~p1)
    # R: sum(cross, na.rm=TRUE); comparisons with NA give NA in R
    valid = ~(nan_mask[:-1] | nan_mask[1:])
    return {"n_crossing_points": float(np.sum(cross & valid))}


def longest_flat_spot(x: np.ndarray) -> dict:
    """features.R:349-353 — max run length within 10 equal-width bins."""
    x = np.asarray(x, dtype=np.float64)
    codes = r_cut_codes(x, breaks=10)
    lengths, _ = rle(codes)
    return {"longest_flat_spot": float(lengths.max())}


def stat_arch_lm(x: np.ndarray, lags: int = 12, demean: bool = True) -> dict:
    """features.R:18-30 — R^2 of x^2 on its first `lags` lags (ARCH LM)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size <= lags + 1:
        return {"stat_arch_lm": NAN}
    if demean:
        x = x - np.nanmean(x)
    x2 = x * x
    n = x2.size
    # embed(x^2, lags+1): row t = (x2[t+lags], x2[t+lags-1], ..., x2[t])
    ncol = lags + 1
    nrow = n - lags
    mat = np.empty((nrow, ncol))
    for j in range(ncol):
        mat[:, j] = x2[lags - j : lags - j + nrow]
    r2 = lm_r_squared(mat[:, 0], mat[:, 1:])
    if math.isnan(r2):
        r2 = 1.0
    return {"stat_arch_lm": r2}


def _roll_mean_partial(x: np.ndarray, size: int) -> np.ndarray:
    """slider::slide_dbl(x, mean, .before=size-1, na.rm=TRUE)."""
    return (
        pd.Series(x).rolling(size, min_periods=1).mean().to_numpy()
    )


def _roll_var_partial(x: np.ndarray, size: int) -> np.ndarray:
    """slider::slide_dbl(x, var, .before=size-1, na.rm=TRUE) (ddof=1)."""
    return pd.Series(x).rolling(size, min_periods=1).var(ddof=1).to_numpy()


def _shift_max(stat: np.ndarray, size: int) -> tuple[float, float]:
    """abs(diff(stat, lag=size)) -> (max, which.max+1); features.R:402-415."""
    diffs = np.abs(stat[size:] - stat[:-size])
    if diffs.size == 0:
        return 0.0, NAN
    if np.isnan(diffs).all():
        return NAN, NAN
    idx = int(np.nanargmax(diffs))
    return float(diffs[idx]), float(idx + 2)  # R which.max is 1-based, +1


def shift_level_max(x, size: int | None = None, period: int = 1) -> dict:
    """features.R:395-417 — largest rolling-mean shift."""
    x = np.asarray(x, dtype=np.float64)
    size = _default_size(size, period)
    m, i = _shift_max(_roll_mean_partial(x, size), size)
    return {"shift_level_max": m, "shift_level_index": i}


def shift_var_max(x, size: int | None = None, period: int = 1) -> dict:
    """features.R:421-444 — largest rolling-variance shift."""
    x = np.asarray(x, dtype=np.float64)
    size = _default_size(size, period)
    m, i = _shift_max(_roll_var_partial(x, size), size)
    return {"shift_var_max": m, "shift_var_index": i}


def shift_kl_max(x, size: int | None = None, period: int = 1) -> dict:
    """features.R:448-487 — largest shift in rolling KL divergence.

    100-point grid Gaussian densities (bw.nrd0 bandwidth, floored at
    dnorm(38)), trailing rolling mean per grid point, KL between windows
    `size` apart, then diff + max.
    """
    x = np.asarray(x, dtype=np.float64)
    size = _default_size(size, period)
    gw = 100
    lo, hi = np.nanmin(x), np.nanmax(x)
    xgrid = np.linspace(lo, hi, gw)
    grid = xgrid[1] - xgrid[0]
    bw = bw_nrd0(x[~np.isnan(x)])
    n = x.size
    if n <= 2 * size:
        raise ValueError("length of `x` is too short for `.size`.")
    dens_floor = float(norm_pdf(38.0))
    # dnorm(38) ~ 2e-314 is SUBNORMAL: flooring the matrix there pushes
    # every downstream cumsum/log/multiply into the x86 denormal slow
    # path (~100x per op). Rescale by an exact power of two so the
    # floored values are normal floats: powers of two scale subnormals
    # exactly, the scale cancels in log(p)-log(q), and the final KL sum
    # divides it back out. The scale is folded into the exp ARGUMENT
    # (ln 2^600) and the argument clamped at the floor's log-level, so
    # exp itself never produces a subnormal (its output underflow band
    # cost ~100ns/element on the elements that landed in it).
    _SCALE = 2.0 ** 600
    dens_floor *= _SCALE
    norm_c = bw * math.sqrt(2.0 * math.pi)
    a_floor = math.log(dens_floor * norm_c)
    # densities in TRANSPOSED (gw, n) layout — one contiguous row per
    # grid point g, so the time-axis cumsum / windowed difference below
    # run at stride 8 instead of stride 8*gw (the (n, gw) layout walked
    # the cache line per element). The grid axis is processed in BLOCKS
    # of rows sized to keep the three working buffers cache-resident:
    # materializing the full (100, n) matrix made every pass a DRAM
    # round-trip (profiled 48 MB x ~10 passes at n=60k, with the two
    # windowed-difference temporaries alone costing more than all the
    # transcendentals), while a (B, n) block is touched ~10 times at
    # cache speed and read from memory once. All passes in-place with
    # the SAME ufunc op order as the unblocked form, so every element
    # is bitwise identical; only the final across-grid nansum changes
    # association (blockwise partial sums), which is below any golden
    # tolerance. Buffers: zbuf carries z -> exp argument -> dens ->
    # excess -> csum -> logr; rbuf carries the rolling mean; kbuf the
    # KL integrand.
    k = min(size, n)
    head = np.arange(1, k + 1, dtype=np.float64)
    kl = np.zeros(n - size)
    blk = max(1, min(gw, int(2_000_000 // (8 * n)) or 1))
    zbuf = np.empty((blk, n))
    rbuf = np.empty((blk, n))
    kbuf = np.empty((blk, n - size))
    log_scale = math.log(_SCALE)
    for g0 in range(0, gw, blk):
        b = min(blk, gw - g0)
        dens = zbuf[:b]
        np.subtract(xgrid[g0 : g0 + b, None], x[None, :], out=dens)
        dens /= bw
        np.multiply(dens, dens, out=dens)
        dens *= -0.5
        dens += log_scale
        # clamp at the floor level BEFORE exp: any argument at or below
        # it floors to dens_floor after the maximum() either way, and
        # the clamp keeps exp's output >= dens_floor*norm_c ~ 1e-133
        # (normal range)
        np.maximum(dens, a_floor, out=dens)
        np.exp(dens, out=dens)
        dens /= norm_c
        np.maximum(dens, dens_floor, out=dens)
        # trailing rolling mean (min_periods=1) via prefix sums. Cumsum
        # of (normal + floor) values absorbs the floor entirely and
        # windows of pure floor would difference to exactly 0 ->
        # log(0). Rolling the excess above the floor and adding the
        # floor back keeps those windows at the floor, matching the
        # windowed-sum (pandas/R) behavior within the golden tolerance.
        dens -= dens_floor
        csum = np.cumsum(dens, axis=1, out=dens)
        rmean = rbuf[:b]
        np.divide(csum[:, :k], head[None, :], out=rmean[:, :k])
        if n > size:
            np.subtract(csum[:, size:], csum[:, :-size], out=rmean[:, size:])
            rmean[:, size:] /= size
        np.maximum(rmean, 0.0, out=rmean)
        rmean += dens_floor
        with np.errstate(divide="ignore", invalid="ignore"):
            # rolling means of the density floor can still round to 0
            # -> log(0); R hits the same inf/NaN arithmetic (na.rm sums
            # keep inf). p and q are overlapping slices of rmean, so
            # ONE log pass over rmean serves both sides of the ratio.
            logr = np.log(rmean, out=csum)
            klterm = np.subtract(
                logr[:, : n - size], logr[:, size:], out=kbuf[:b]
            )
            # p sits in rmean, which logr (out=csum) did NOT overwrite
            klterm *= rmean[:, : n - size]
            kl += np.nansum(klterm, axis=0)
    with np.errstate(invalid="ignore"):
        kl *= grid / _SCALE
        diffkl = np.diff(kl)
    if diffkl.size == 0:
        return {"shift_kl_max": 0.0, "shift_kl_index": NAN}
    idx = int(np.nanargmax(diffkl))
    return {"shift_kl_max": float(np.nanmax(diffkl)), "shift_kl_index": float(idx + 2)}


def _zscore(x: np.ndarray) -> np.ndarray:
    """base::scale(x) — center by mean, scale by sd (ddof=1)."""
    mu = np.nanmean(x)
    sd = r_sd(x)
    return (x - mu) / sd


def var_tiled_var(x, size: int | None = None, period: int = 1) -> dict:
    """features.R:562-576 (lumpiness) — var of tile variances, full tiles."""
    x = np.asarray(x, dtype=np.float64)
    size = _default_size(size, period)
    z = _zscore(x)
    n = z.size
    n_tiles = n // size
    if n < 2 * size:
        return {"var_tiled_var": 0.0}
    tiles = z[: n_tiles * size].reshape(n_tiles, size)
    with np.errstate(invalid="ignore"):
        tile_vars = np.nanvar(tiles, axis=1, ddof=1)
    return {"var_tiled_var": r_var(tile_vars)}


def var_tiled_mean(x, size: int | None = None, period: int = 1) -> dict:
    """features.R:580-595 (stability) — var of tile means, ragged last tile."""
    x = np.asarray(x, dtype=np.float64)
    size = _default_size(size, period)
    z = _zscore(x)
    n = z.size
    if n < 2 * size:
        return {"var_tiled_mean": 0.0}
    n_full = n // size
    full = np.nanmean(z[: n_full * size].reshape(n_full, size), axis=1)
    if n_full * size < n:  # ragged final tile included (no .complete)
        means = np.append(full, np.nanmean(z[n_full * size :]))
    else:
        means = full
    return {"var_tiled_mean": r_var(means)}


def feat_intermittent(x: np.ndarray) -> dict:
    """features.R:716-726 — intermittency measures via run-length encoding."""
    x = np.asarray(x, dtype=np.float64)
    lengths, values = rle(x)
    nonzero = x[x != 0]
    n = x.size
    zero_runs = lengths[values == 0]
    zero_run_mean = (
        0.0 if nonzero.size == n else float(zero_runs.mean()) if zero_runs.size else NAN
    )
    sd_nz = r_sd(nonzero)
    mean_nz = float(np.nanmean(nonzero)) if nonzero.size else NAN
    return {
        "zero_run_mean": zero_run_mean,
        "nonzero_squared_cv": (sd_nz / mean_nz) ** 2 if mean_nz else NAN,
        "zero_start_prop": float(lengths[0]) / n if values[0] == 0 else 0.0,
        "zero_end_prop": float(lengths[-1]) / n if values[-1] == 0 else 0.0,
    }


def guerrero(x, lower: float = -0.9, upper: float = 2.0, period: int = 2) -> dict:
    """guerrero.R:30-60 — Box-Cox lambda minimizing subseries CV.

    Takes the LAST n_sub*period observations, reshapes column-major into a
    (period x n_sub) matrix, and Brent-minimizes the coefficient of
    variation of sd_h / mean_h^(1-lambda) over subseries h.
    """
    x = np.asarray(x, dtype=np.float64)
    if np.all(x == x[0]):
        return {"lambda_guerrero": 1.0}
    period = max(2, int(period))
    n = x.size
    n_sub = n // period
    tail = x[n - n_sub * period :]
    mat = tail.reshape(n_sub, period).T  # column-major (period, n_sub)
    mu_h = np.nanmean(mat, axis=0)
    # vectorized stats::sd(na.rm=TRUE) per subseries column: nanvar with
    # ddof=1 matches r_sd including the <2-values -> NaN case (numpy warns
    # on those columns instead of raising; suppress like r_var does)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        sig_h = np.sqrt(np.nanvar(mat, axis=0, ddof=1))

    def coef_var(lam: float) -> float:
        rat = sig_h / mu_h ** (1.0 - lam)
        m = np.nanmean(rat)
        s = r_sd(rat)
        return s / m

    return {"lambda_guerrero": brent_fmin(coef_var, lower, upper)}
