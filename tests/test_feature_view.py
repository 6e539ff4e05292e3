"""Incremental feature materialization (FeatureView): the per-series
feature table must equal a from-scratch features() run over the current
source after every refresh, while recomputing only dirty series."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from feasts_spark.operators.continuous import FeatureView
from feasts_spark.operators.features import features
from feasts_spark.sources.snapshots import SnapshotTable

T0 = dt.datetime(2024, 3, 1)

_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])

SELECT = ("n_crossing_points", "longest_flat_spot", "feat_acf")


def _turns(spark, convs, n_each=40, start=0, bump=0.0):
    rows = [
        Row(conv_id=c, ts=T0 + dt.timedelta(minutes=start + i),
            value=float((i * 31 + j * 7) % 23) + bump)
        for j, c in enumerate(convs)
        for i in range(n_each)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture()
def fv(spark, tmp_path):
    src = SnapshotTable(spark, str(tmp_path), "raw", stats_cols=("ts",))
    tgt = SnapshotTable(spark, str(tmp_path), "feats", stats_cols=("_kb",))
    return src, tgt, FeatureView(src, tgt, n_buckets=8, select=SELECT)


def _assert_synced(src, tgt, view):
    expect = features(
        src.read(), key_col="conv_id", order_col="ts", value_col="value",
        select=SELECT, min_points=view.min_points,
    )
    got = tgt.read().drop("_kb")
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


class TestFeatureView:
    def test_full_build_then_noop(self, spark, fv):
        src, tgt, view = fv
        src.append(_turns(spark, [f"c{i}" for i in range(10)]))
        s = view.refresh()
        assert s["mode"] == "full"
        _assert_synced(src, tgt, view)
        assert view.refresh()["mode"] == "noop"

    def test_append_recomputes_only_dirty_series(self, spark, fv):
        src, tgt, view = fv
        src.append(_turns(spark, [f"c{i}" for i in range(10)]))
        view.refresh()
        before = {
            r["conv_id"]: r for r in tgt.read().drop("_kb").collect()
        }
        # extend exactly two conversations
        src.append(_turns(spark, ["c2", "c7"], start=40))
        s = view.refresh()
        assert s["mode"] == "incremental" and s["dirty_keys"] == 2
        _assert_synced(src, tgt, view)
        after = {r["conv_id"]: r for r in tgt.read().drop("_kb").collect()}
        # untouched series rows are bitwise identical
        for c, row in before.items():
            if c not in ("c2", "c7"):
                assert after[c] == row

    def test_correction_changes_dirty_feature_row(self, spark, fv):
        src, tgt, view = fv
        src.append(_turns(spark, ["c0", "c1", "c2"]))
        view.refresh()
        old_c1 = tgt.read().filter(F.col("conv_id") == "c1").collect()[0]
        lo = T0 + dt.timedelta(minutes=5)
        hi = T0 + dt.timedelta(minutes=14)
        fixed = src.read().filter(F.col("ts").between(lo, hi)) \
            .withColumn("value", F.lit(99.0))
        src.replace_where(fixed, "ts", lo, hi)
        s = view.refresh()
        assert s["mode"] == "incremental"
        _assert_synced(src, tgt, view)
        new_c1 = tgt.read().filter(F.col("conv_id") == "c1").collect()[0]
        assert new_c1["longest_flat_spot"] != old_c1["longest_flat_spot"]

    def test_deleted_series_drops_from_view(self, spark, fv):
        src, tgt, view = fv
        src.append(_turns(spark, ["c0", "c1", "c2"]))
        view.refresh()
        full = src.read()
        mn, mx = full.agg(F.min("ts"), F.max("ts")).collect()[0]
        src.replace_where(full.filter(F.col("conv_id") != "c1"),
                          "ts", mn, mx)
        view.refresh()
        assert tgt.read().filter(F.col("conv_id") == "c1").count() == 0
        _assert_synced(src, tgt, view)

    def test_min_points_applies_to_new_series(self, spark, fv):
        src, tgt, view = fv
        view.min_points = 20
        src.append(_turns(spark, ["c0", "c1"]))
        view.refresh()
        src.append(_turns(spark, ["tiny"], n_each=3))
        view.refresh()
        assert tgt.read().filter(F.col("conv_id") == "tiny").count() == 0
        _assert_synced(src, tgt, view)

    def test_run_count_bounded(self, spark, fv):
        src, tgt, view = fv
        src.append(_turns(spark, [f"c{i}" for i in range(32)]))
        view.refresh()
        # dirty every bucket, cap commits
        src.append(_turns(spark, [f"c{i}" for i in range(32)], start=40))
        s = view.refresh(coalesce_gap_buckets=0, max_commits=3)
        assert s["commits"] <= 3
        _assert_synced(src, tgt, view)
