"""X-11-method decomposition: weight goldens, kernel properties, and
Spark operator vs kernel parity (reference x11.R:19-91 delegates to the
Census binary; this engine implements the published algorithm itself —
provenance in kernels/x11.py)."""

import numpy as np
import pytest

from feasts_spark.kernels.x11 import (
    default_henderson_length,
    henderson_weight_table,
    henderson_weights,
    musgrave_weights,
    x11_decompose_kernel,
    _henderson_apply,
)
from feasts_spark.operators.decompose import x11_decomposition
from feasts_spark.operators.rollup import rollup_raw


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


class TestWeights:
    def test_henderson_13_matches_published(self):
        # Ladiray & Quenneville table of the classic 13-term filter
        w = henderson_weights(13)
        exp = [0.24006, 0.21434, 0.14736, 0.06549, 0.0, -0.02786, -0.01935]
        np.testing.assert_allclose(w[6:], exp, atol=5e-6)
        assert abs(w.sum() - 1.0) < 1e-12
        np.testing.assert_allclose(w, w[::-1])  # symmetric

    @pytest.mark.parametrize("length", [5, 7, 9, 13, 23])
    def test_henderson_cubic_exact(self, length):
        # the Henderson filter's defining property: cubics pass unchanged
        t = np.arange(80.0)
        y = 0.01 * t**3 - 0.5 * t**2 + 2 * t + 7
        half = length // 2
        tr = _henderson_apply(y, length)
        np.testing.assert_allclose(tr[half:-half], y[half:-half], atol=1e-7)

    def test_musgrave_sums_and_slope_limit(self):
        w = henderson_weights(13)
        for q in range(6):
            u = musgrave_weights(w, q, 3.5)
            assert abs(u.sum() - 1.0) < 1e-12
            # D -> inf projects dropped mass onto the local line: the
            # asymmetric filter then reproduces linears exactly
            u_inf = musgrave_weights(w, q, 1e-9)
            i = np.arange(-6, q + 1)
            assert abs((u_inf * i).sum()) < 1e-6

    def test_weight_table_covers_all_end_shapes(self):
        tbl = henderson_weight_table(9)
        assert len(tbl) == 25
        for (a, b), w in tbl.items():
            assert abs(w.sum() - 1.0) < 1e-12
            assert np.all(w[: 4 - a] == 0) and np.all(
                w[len(w) - (4 - b):] == 0
            )

    def test_default_lengths(self):
        assert default_henderson_length(12) == 13
        assert default_henderson_length(4) == 5
        assert default_henderson_length(7) == 9


class TestKernel:
    def _series(self, n=150, m=7, seed=1):
        rng = np.random.default_rng(seed)
        seas = rng.normal(0, 2, m)
        seas -= seas.mean()
        return (
            0.4 * np.arange(n) + 20
            + seas[np.arange(n) % m]
            + rng.normal(0, 0.3, n)
        ), seas

    def test_reconstruction_identity_additive(self):
        y, _ = self._series()
        d = x11_decompose_kernel(y, 7)
        np.testing.assert_allclose(
            d["trend"] + d["seasonal"] + d["irregular"], y, atol=1e-10
        )
        np.testing.assert_allclose(d["season_adjust"], y - d["seasonal"])

    def test_reconstruction_identity_multiplicative(self):
        y, _ = self._series()
        ym = np.exp(y / 50)
        d = x11_decompose_kernel(ym, 7, type="multiplicative")
        np.testing.assert_allclose(
            d["trend"] * d["seasonal"] * d["irregular"], ym, rtol=1e-12
        )

    def test_seasonal_recovery(self):
        y, seas = self._series(n=210)
        d = x11_decompose_kernel(y, 7)
        est = np.array([
            np.mean(d["seasonal"][p::7][5:-5]) for p in range(7)
        ])
        np.testing.assert_allclose(est, seas, atol=0.25)
        # trend tracks the line away from the ends
        t = 0.4 * np.arange(210) + 20
        assert np.abs(d["trend"][10:-10] - t[10:-10]).max() < 0.6

    @pytest.mark.parametrize("m", [4, 12])
    def test_reference_periods(self, m):
        rng = np.random.default_rng(m)
        n = 12 * m
        y = np.linspace(0, 30, n) + np.tile(rng.normal(0, 1, m), 12)
        d = x11_decompose_kernel(y, m)
        np.testing.assert_allclose(
            d["trend"] + d["seasonal"] + d["irregular"], y, atol=1e-10
        )

    def test_guards(self):
        with pytest.raises(ValueError):
            x11_decompose_kernel(np.arange(10.0), 7)  # < two cycles
        with pytest.raises(ValueError):
            x11_decompose_kernel(
                np.array([1.0, -1.0] * 20), 4, type="multiplicative"
            )
        with pytest.raises(ValueError):
            x11_decompose_kernel(np.arange(40.0), 7, type="bogus")


class TestSparkOperator:
    def test_matches_kernel_on_events(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        out = (
            x11_decomposition(r, period=7, type="additive")
            .orderBy("series_key", "bucket_ts")
            .toPandas()
        )
        assert len(out) > 0
        checked = 0
        for key, grp in out.groupby("series_key"):
            y = grp["val_avg"].to_numpy()
            exp = x11_decompose_kernel(y, 7)
            for col in ("trend", "seasonal", "irregular", "season_adjust"):
                np.testing.assert_allclose(
                    grp[col].to_numpy(), exp[col], rtol=1e-9, atol=1e-9,
                    err_msg=f"{key}/{col}",
                )
            checked += 1
        assert checked >= 3

    def test_short_series_dropped_and_multiplicative(self, spark):
        import pandas as pd

        rng = np.random.default_rng(3)
        rows = []
        for key, n in (("long", 60), ("short", 7)):
            y = np.exp(
                (0.2 * np.arange(n) + np.tile(rng.normal(0, 1, 4), 20)[:n])
                / 30
            )
            rows += [(key, i, float(v)) for i, v in enumerate(y)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["series_key", "bucket_ts", "val_avg"])
        )
        out = (
            x11_decomposition(df, period=4, type="multiplicative")
            .orderBy("series_key", "bucket_ts")
            .toPandas()
        )
        assert set(out["series_key"]) == {"long"}  # 7 < 2 cycles of 4
        y = out["val_avg"].to_numpy()
        exp = x11_decompose_kernel(y, 4, type="multiplicative")
        np.testing.assert_allclose(
            out["trend"].to_numpy() * out["seasonal"].to_numpy()
            * out["irregular"].to_numpy(), y, rtol=1e-9,
        )
        np.testing.assert_allclose(out["trend"].to_numpy(), exp["trend"],
                                   rtol=1e-9)

    def test_plan_is_jvm_only(self, spark, events):
        r = rollup_raw(events, "1d", "user_id", "ts", "value")
        plan = x11_decomposition(r, period=7)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
