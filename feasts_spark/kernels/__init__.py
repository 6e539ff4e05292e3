"""Pure numpy/pandas kernels reproducing the reference math exactly.

Every kernel documents the reference file:line it reimplements
(tidyverts/feasts R sources and the R `stats` routines they delegate to).
No scipy/statsmodels — all special functions and optimizers are hand-built
(see rmath.py). These kernels are Spark-agnostic so they unit-test in
milliseconds and are invoked from Arrow-batched pandas UDFs in
feasts_spark.operators.
"""

from feasts_spark.kernels.acf import acf_r, ccf_r, na_contiguous, pacf_r
from feasts_spark.kernels.features_basic import (
    feat_intermittent,
    guerrero,
    longest_flat_spot,
    n_crossing_points,
    shift_kl_max,
    shift_level_max,
    shift_var_max,
    stat_arch_lm,
    var_tiled_mean,
    var_tiled_var,
)
from feasts_spark.kernels.feat_cf import feat_acf, feat_pacf
from feasts_spark.kernels.spectral import burg_ar, feat_spectral
from feasts_spark.kernels.stat_tests import box_pierce, ljung_box
from feasts_spark.kernels.stl import estimate_stl, r_stl, supsmu
from feasts_spark.kernels.feat_stl import feat_stl

__all__ = [
    "acf_r", "pacf_r", "ccf_r", "na_contiguous",
    "n_crossing_points", "longest_flat_spot", "stat_arch_lm",
    "shift_level_max", "shift_var_max", "shift_kl_max",
    "var_tiled_var", "var_tiled_mean", "feat_intermittent", "guerrero",
    "feat_acf", "feat_pacf", "feat_spectral", "burg_ar",
    "ljung_box", "box_pierce",
    "estimate_stl", "r_stl", "supsmu", "feat_stl",
]
