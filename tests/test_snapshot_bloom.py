"""Per-file key blooms in snapshot manifests: key-addressed reads must open
only the files that may hold the probed keys, NEVER miss a file that does
(no false negatives), survive copy-on-write carries, and degrade to
read-everything when blooms are absent or the distinct cap is exceeded."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row, functions as F, types as T

from feasts_spark.sources.snapshots import (
    SnapshotTable,
    _bloom_build,
    _bloom_hash,
    _bloom_any_match,
)

T0 = dt.datetime(2024, 3, 1)

_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _turns(spark, conv_ids, minutes=30, day=0):
    rows = [
        Row(conv_id=c, ts=T0 + dt.timedelta(days=day, minutes=m),
            value=float(m))
        for c in conv_ids for m in range(minutes)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


class TestBloomPrimitive:
    def test_no_false_negatives_and_low_fpr(self):
        keys = [f"conv-{i}" for i in range(2000)]
        b = _bloom_build(keys, max_bytes=32 * 1024)
        # every inserted key matches (probe one at a time)
        for k in keys[::97]:
            assert _bloom_any_match(b, _bloom_hash([k]))
        # absent keys almost never match at ~1% target FPR
        misses = sum(
            _bloom_any_match(b, _bloom_hash([f"other-{i}"]))
            for i in range(1000)
        )
        assert misses < 50

    def test_batch_probe_is_any_semantics(self):
        b = _bloom_build(["a", "b"], max_bytes=1024)
        assert _bloom_any_match(b, _bloom_hash(["zzz", "b"]))
        assert not _bloom_any_match(
            b, _bloom_hash([f"no-{i}" for i in range(20)])
        )

    def test_non_string_keys_hash_canonically(self):
        b = _bloom_build([17, 42], max_bytes=1024)
        assert _bloom_any_match(b, _bloom_hash([42]))

    def test_bitmap_capped_by_max_bytes(self):
        b = _bloom_build([f"k{i}" for i in range(100_000)], max_bytes=1024)
        assert b["m"] <= 8 * 1024


class TestManifestBlooms:
    def test_appends_carry_blooms_and_prune(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "raw", stats_cols=("ts",),
                          bloom_cols=("conv_id",))
        t.append(_turns(spark, [f"a{i}" for i in range(20)]))
        t.append(_turns(spark, [f"b{i}" for i in range(20)], day=1))
        files = t.manifest()["files"]
        assert all("conv_id" in f.get("bloom", {}) for f in files)

        live, total = t.files_for_keys("conv_id", ["a3"])
        assert 0 < len(live) < total
        got = t.read_containing("conv_id", ["a3"]) \
            .filter(F.col("conv_id") == "a3")
        assert got.count() == 30
        # superset semantics: every a-file key is reachable (no false negs)
        for k in [f"a{i}" for i in range(20)] + [f"b{i}" for i in range(20)]:
            n = t.read_containing("conv_id", [k]) \
                .filter(F.col("conv_id") == k).count()
            assert n == 30, k

    def test_empty_probe_set_reads_nothing(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "raw",
                          bloom_cols=("conv_id",))
        t.append(_turns(spark, ["x"]))
        live, total = t.files_for_keys("conv_id", [])
        assert live == [] and total >= 1
        assert t.read_containing("conv_id", []).count() == 0

    def test_bloomless_table_never_prunes(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "raw")
        t.append(_turns(spark, ["x", "y"]))
        live, total = t.files_for_keys("conv_id", ["nope"])
        assert len(live) == total  # no bloom -> must inspect everything

    def test_distinct_cap_skips_bloom_not_correctness(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "raw",
                          bloom_cols=("conv_id",), bloom_max_distinct=3)
        t.append(_turns(spark, [f"c{i}" for i in range(8)], minutes=2))
        # over-cap files record no bloom and therefore always survive
        assert t.read_containing("conv_id", ["c5"]) \
            .filter(F.col("conv_id") == "c5").count() == 2

    def test_cow_replace_carries_blooms_by_reference(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "raw", stats_cols=("ts",),
                          bloom_cols=("conv_id",))
        t.append(_turns(spark, ["a"], day=0))
        t.append(_turns(spark, ["b"], day=2))
        lo, hi = T0 + dt.timedelta(days=2), T0 + dt.timedelta(days=3)
        fixed = t.read().filter(F.col("ts").between(lo, hi)) \
            .withColumn("value", F.lit(-1.0))
        t.replace_where(fixed, "ts", lo, hi)
        files = t.manifest()["files"]
        assert all("conv_id" in f.get("bloom", {}) for f in files)
        # day-0 'a' file carried by reference, still bloom-addressable
        live, total = t.files_for_keys("conv_id", ["a"])
        assert 0 < len(live) < total


class TestFeatureViewBloomPruning:
    def test_refresh_prunes_source_files_and_matches_batch(
            self, spark, tmp_path):
        from feasts_spark.operators.continuous import FeatureView
        from feasts_spark.operators.features import features

        src = SnapshotTable(spark, str(tmp_path), "raw",
                            stats_cols=("ts",), bloom_cols=("conv_id",))
        tgt = SnapshotTable(spark, str(tmp_path), "feat",
                            stats_cols=("_kb",))
        rng = np.random.default_rng(3)
        for day in range(3):
            convs = [f"d{day}-{i}" for i in range(6)]
            rows = [
                Row(conv_id=c,
                    ts=T0 + dt.timedelta(days=day, minutes=m),
                    value=float(rng.normal(0, 1)))
                for c in convs for m in range(60)
            ]
            src.append(spark.createDataFrame(rows, _SCHEMA))

        view = FeatureView(src, tgt, min_points=30, period=12)
        assert view.refresh()["mode"] == "full"

        # correct a slice of day 1: the rewritten files dirty the day-1
        # conversations (invalidation is file-granular), days 0/2 stay clean
        lo = T0 + dt.timedelta(days=1, minutes=10)
        hi = T0 + dt.timedelta(days=1, minutes=19)
        in_range = src.read().filter(F.col("ts").between(lo, hi))
        fixed = in_range.withColumn(
            "value",
            F.when(F.col("conv_id") == "d1-2", F.col("value") + 10.0)
            .otherwise(F.col("value")))
        src.replace_where(fixed, "ts", lo, hi)
        st = view.refresh()
        assert st["mode"] == "incremental" and st["dirty_keys"] >= 1

        # the bloom actually prunes: the dirty key's history lives in the
        # day-1 files only
        dirty = ["d1-2"]
        live, total = src.files_for_keys("conv_id", dirty)
        assert len(live) < total

        # and the refreshed table equals batch features of current source
        expect = features(src.read(), key_col="conv_id", order_col="ts",
                          value_col="value", period=12, min_points=30)
        got = tgt.read().drop("_kb")
        cols = got.columns
        a = got.orderBy("conv_id").toPandas()[cols]
        b = expect.orderBy("conv_id").toPandas()[cols]
        import pandas as pd
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True),
                                      check_exact=False, rtol=1e-9)


class TestReviewHardening:
    def test_numeric_cross_type_probe_matches(self, spark, tmp_path):
        """Bloom built from a DOUBLE column must match int probe keys
        (Spark equality coerces across the numeric family)."""
        t = SnapshotTable(spark, str(tmp_path), "num",
                          bloom_cols=("uid",))
        df = spark.range(5).select(
            (F.col("id") + 100).cast("double").alias("uid"),
            F.lit(1.0).alias("value"))
        t.append(df)
        live, total = t.files_for_keys("uid", [102])   # int probe
        assert len(live) >= 1                          # no false negative
        assert t.delete_keyed("uid", [102]) is not None
        assert t.read().count() == 4
        assert t.read().filter(F.col("uid") == 102.0).count() == 0

    def test_all_null_file_never_matches(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "nn",
                          bloom_cols=("conv_id",))
        rows = [Row(conv_id=None, ts=T0, value=1.0)]
        t.append(spark.createDataFrame(rows, _SCHEMA))
        t.append(_turns(spark, ["real"], minutes=2))
        live, total = t.files_for_keys("conv_id", ["real"])
        assert len(live) < total  # the all-NULL file is provably clean

    def test_bloom_max_bytes_cap_respected(self):
        from feasts_spark.sources.snapshots import _bloom_build
        b = _bloom_build([f"k{i}" for i in range(50)], max_bytes=64)
        assert b["m"] <= 8 * 64

    def test_null_probe_keys_stripped(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "np",
                          bloom_cols=("conv_id",))
        t.append(_turns(spark, ["x"], minutes=2))
        live, total = t.files_for_keys("conv_id", [None, "x"])
        assert len(live) == total
        assert t.files_for_keys("conv_id", [None]) == ([], total)
