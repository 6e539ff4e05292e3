"""Key-addressed writes on snapshot tables: upsert_keyed (MERGE by key)
and delete_keyed (equality erasure). Bloom-pruned — provably-clean files
must carry by reference bitwise — and exactly equivalent to the
corresponding full-table SQL semantics."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from feasts_spark.operators.continuous import ContinuousAggregate
from feasts_spark.operators.rollup import rollup_raw
from feasts_spark.sources.snapshots import SnapshotTable

T0 = dt.datetime(2024, 3, 1)

_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _turns(spark, conv_ids, minutes=10, day=0):
    rows = [
        Row(conv_id=c, ts=T0 + dt.timedelta(days=day, minutes=m),
            value=float(m))
        for c in conv_ids for m in range(minutes)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "raw", stats_cols=("ts",),
                      bloom_cols=("conv_id",))
    t.append(_turns(spark, ["a1", "a2"], day=0))
    t.append(_turns(spark, ["b1", "b2"], day=1))
    return t


class TestUpsertKeyed:
    def test_merge_semantics(self, spark, table):
        newdf = _turns(spark, ["a1"], minutes=3, day=5).unionByName(
            _turns(spark, ["c9"], minutes=4, day=5))
        table.upsert_keyed(newdf, "conv_id")
        got = table.read()
        # a1 fully replaced by its 3 new rows; a2/b* untouched; c9 inserted
        assert got.filter(F.col("conv_id") == "a1").count() == 3
        assert got.filter(F.col("conv_id") == "a2").count() == 10
        assert got.filter(F.col("conv_id") == "c9").count() == 4
        assert got.count() == 3 + 10 + 10 + 10 + 4

    def test_clean_files_carry_by_reference(self, spark, table):
        before = {f["path"] for f in table.manifest()["files"]}
        table.upsert_keyed(_turns(spark, ["a1"], minutes=2, day=6),
                           "conv_id")
        m = table.manifest()
        assert m["operation"] == "upsert"
        # the b-commit file(s) hold no 'a1': provably clean, carried
        carried = {f["path"] for f in m["files"]} & before
        assert carried, "bloom should keep key-free files by reference"
        assert m["summary"]["kept_files"] >= 1
        assert m["summary"]["rewritten_files"] >= 1

    def test_without_blooms_still_correct(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "nb")
        t.append(_turns(spark, ["x", "y"]))
        t.upsert_keyed(_turns(spark, ["x"], minutes=1, day=2), "conv_id")
        assert t.read().filter(F.col("conv_id") == "x").count() == 1
        assert t.read().filter(F.col("conv_id") == "y").count() == 10

    def test_composite_key(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "ck",
                          bloom_cols=("conv_id",))
        t.append(_turns(spark, ["k"], minutes=5))
        one = _turns(spark, ["k"], minutes=1).withColumn(
            "value", F.lit(99.0))
        t.upsert_keyed(one, ["conv_id", "ts"])
        got = t.read().orderBy("ts").collect()
        assert got[0].value == 99.0 and len(got) == 5
        assert [r.value for r in got[1:]] == [1.0, 2.0, 3.0, 4.0]


class TestDeleteKeyed:
    def test_erasure_and_pruning(self, spark, table):
        before = {f["path"] for f in table.manifest()["files"]}
        v = table.delete_keyed("conv_id", ["b1"])
        assert v is not None
        got = table.read()
        assert got.filter(F.col("conv_id") == "b1").count() == 0
        assert got.count() == 30
        m = table.manifest()
        assert m["operation"] == "delete"
        assert ({f["path"] for f in m["files"]} & before), \
            "a-files must carry by reference"

    def test_absent_key_is_metadata_noop(self, spark, table):
        v0 = table.current_version()
        assert table.delete_keyed("conv_id", ["zzz"]) is None
        assert table.current_version() == v0

    def test_null_and_empty_keys(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "nk",
                          bloom_cols=("conv_id",))
        rows = [Row(conv_id=None, ts=T0, value=1.0),
                Row(conv_id="g", ts=T0, value=2.0)]
        t.append(spark.createDataFrame(rows, _SCHEMA))
        assert t.delete_keyed("conv_id", []) is None
        t.delete_keyed("conv_id", ["g", None])
        left = t.read().collect()
        assert len(left) == 1 and left[0].conv_id is None

    def test_dataframe_keys_equal_list_keys(self, spark, table, tmp_path):
        """The frame form (the never-on-the-driver erasure path) must
        produce the identical table state as the list form, including
        bloom carry-by-reference and the summary bookkeeping."""
        twin = SnapshotTable(spark, str(tmp_path / "twin"), "raw",
                             stats_cols=("ts",), bloom_cols=("conv_id",))
        twin.append(_turns(spark, ["a1", "a2"], day=0))
        twin.append(_turns(spark, ["b1", "b2"], day=1))
        table.delete_keyed("conv_id", ["b1"])
        kdf = spark.createDataFrame([("b1",)], "k string")
        v = twin.delete_keyed("conv_id", kdf)
        assert v is not None
        a = sorted(map(tuple, table.read().collect()))
        b = sorted(map(tuple, twin.read().collect()))
        assert a == b
        m = twin.manifest()
        assert m["summary"]["n_keys"] == 1
        assert m["summary"]["kept_files"] >= 1  # a-file provably clean

    def test_dataframe_keys_empty_and_null(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "nkf",
                          bloom_cols=("conv_id",))
        rows = [Row(conv_id=None, ts=T0, value=1.0),
                Row(conv_id="g", ts=T0, value=2.0)]
        t.append(spark.createDataFrame(rows, _SCHEMA))
        v0 = t.current_version()
        empty = spark.createDataFrame([], "k string")
        assert t.delete_keyed("conv_id", empty) is None
        nulls = spark.createDataFrame([(None,)], "k string")
        assert t.delete_keyed("conv_id", nulls) is None
        assert t.current_version() == v0
        t.delete_keyed(
            "conv_id", spark.createDataFrame([("g",), (None,)], "k string"))
        left = t.read().collect()
        assert len(left) == 1 and left[0].conv_id is None

    def test_dataframe_keys_without_blooms(self, spark, tmp_path):
        """No blooms -> probe is None -> every file rewrites through the
        distributed anti join (the past-the-cap degradation path), still
        exact."""
        t = SnapshotTable(spark, str(tmp_path), "nb")
        t.append(_turns(spark, ["x", "y", "z"], minutes=3))
        kdf = spark.createDataFrame([("y",)], "k string")
        assert t.delete_keyed("conv_id", kdf) is not None
        got = {r["conv_id"] for r in t.read().select("conv_id").collect()}
        assert got == {"x", "z"}

    def test_dataframe_keys_rejects_multicolumn(self, spark, table):
        with pytest.raises(ValueError, match="single-column"):
            table.delete_keyed(
                "conv_id",
                spark.createDataFrame([("a", "b")], "k string, j string"))

    def test_large_key_list_join_path(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "big",
                          bloom_cols=("conv_id",))
        t.append(_turns(spark, [f"c{i}" for i in range(30)], minutes=2))
        keys = [f"c{i}" for i in range(0, 30, 2)] + \
               [f"ghost{i}" for i in range(1100)]
        t.delete_keyed("conv_id", keys)
        got = t.read()
        assert got.count() == 15 * 2
        assert got.filter(F.col("conv_id") == "c2").count() == 0
        assert got.filter(F.col("conv_id") == "c3").count() == 2


class TestDownstreamInvalidation:
    def test_cagg_recomputes_after_keyed_writes(self, spark, tmp_path):
        src = SnapshotTable(spark, str(tmp_path), "raw",
                            stats_cols=("ts",), bloom_cols=("conv_id",))
        tgt = SnapshotTable(spark, str(tmp_path), "t1h",
                            stats_cols=("bucket_ts",))
        src.append(_turns(spark, ["a", "b"], minutes=120))
        cagg = ContinuousAggregate(src, tgt, "1h")
        assert cagg.refresh()["mode"] == "full"

        src.upsert_keyed(
            _turns(spark, ["a"], minutes=30).withColumn(
                "value", F.col("value") * 10), "conv_id")
        assert cagg.refresh()["mode"] == "recompute"
        src.delete_keyed("conv_id", ["b"])
        assert cagg.refresh()["mode"] == "recompute"

        def _r(df):
            return df.withColumn("val_avg", F.round("val_avg", 9)) \
                     .withColumn("val_sum", F.round("val_sum", 9))
        expect = _r(rollup_raw(src.read(), "1h"))
        got = _r(tgt.read())
        assert got.count() == expect.count()
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0
