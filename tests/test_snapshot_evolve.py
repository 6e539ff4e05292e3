"""Metadata-only schema evolution on snapshot tables: ADD/DROP COLUMN must
commit without touching any data file, old files must read as NULL for
added columns, time travel must keep per-version schemas, and downstream
consumers (writers, caggs) must keep working across the evolution."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from feasts_spark.sources.snapshots import SnapshotTable

T0 = dt.datetime(2024, 3, 1)

_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _turns(spark, conv_ids, minutes=5, day=0, tool=None):
    rows = [
        Row(conv_id=c, ts=T0 + dt.timedelta(days=day, minutes=m),
            value=float(m))
        for c in conv_ids for m in range(minutes)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    if tool is not None:
        df = df.withColumn("tool", F.lit(tool))
    return df


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "raw", stats_cols=("ts",))
    t.append(_turns(spark, ["a"]))
    return t


class TestAddColumn:
    def test_metadata_only_and_null_backfill(self, spark, table):
        files_before = {f["path"] for f in table.manifest()["files"]}
        v = table.evolve_add_columns({"tool": "string"})
        m = table.manifest()
        assert m["operation"] == "evolve"
        assert {f["path"] for f in m["files"]} == files_before
        # old rows read as NULL for the new column
        got = table.read()
        assert "tool" in got.columns
        assert got.filter(F.col("tool").isNull()).count() == 5
        # new appends carry it; mixed files read consistently
        table.append(_turns(spark, ["b"], day=1, tool="bash"))
        got = table.read()
        assert got.filter(F.col("tool") == "bash").count() == 5
        assert got.filter(F.col("tool").isNull()).count() == 5
        # time travel: the pre-evolution snapshot keeps the old shape
        assert "tool" not in table.read(version=v - 1).columns

    def test_legacy_writer_via_aligned(self, spark, table):
        table.evolve_add_columns({"tool": "string"})
        legacy = _turns(spark, ["c"], day=2)  # no 'tool' column
        with pytest.raises(ValueError, match="schema mismatch"):
            table.append(legacy)
        table.append(table.aligned(legacy))
        assert table.read().filter(F.col("conv_id") == "c").count() == 5

    def test_add_existing_raises(self, spark, table):
        with pytest.raises(ValueError, match="already exists"):
            table.evolve_add_columns({"value": "double"})

    def test_empty_table_raises(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "e")
        with pytest.raises(ValueError, match="no schema"):
            t.evolve_add_columns({"x": "int"})

    def test_complex_type(self, spark, table):
        table.evolve_add_columns({"tags": "array<string>"})
        table.append(table.aligned(_turns(spark, ["d"], day=3)))
        row = table.read().filter(F.col("conv_id") == "d").first()
        assert row.tags is None


class TestDropColumn:
    def test_metadata_only_drop(self, spark, table):
        files_before = {f["path"] for f in table.manifest()["files"]}
        table.evolve_drop_columns("value")
        m = table.manifest()
        assert {f["path"] for f in m["files"]} == files_before
        got = table.read()
        assert got.columns == ["conv_id", "ts"]
        assert got.count() == 5
        # writers now append the narrowed shape
        table.append(_turns(spark, ["z"], day=4).drop("value"))
        assert table.read().count() == 10

    def test_drop_absent_and_all_raise(self, spark, table):
        with pytest.raises(ValueError, match="absent"):
            table.evolve_drop_columns(["nope"])
        with pytest.raises(ValueError, match="every column"):
            table.evolve_drop_columns(["conv_id", "ts", "value"])


class TestDownstreamAcrossEvolution:
    def test_replace_where_materializes_added_column(self, spark, table):
        table.evolve_add_columns({"tool": "string"})
        lo, hi = T0, T0 + dt.timedelta(minutes=2)
        fixed = table.read().filter(F.col("ts").between(lo, hi)) \
            .withColumn("tool", F.lit("edit"))
        table.replace_where(fixed, "ts", lo, hi)
        got = table.read()
        assert got.filter(F.col("tool") == "edit").count() == 3
        assert got.filter(F.col("tool").isNull()).count() == 2

    def test_cagg_sees_evolve_as_no_data_change(self, spark, tmp_path):
        from feasts_spark.operators.continuous import ContinuousAggregate
        src = SnapshotTable(spark, str(tmp_path), "raw",
                            stats_cols=("ts",))
        tgt = SnapshotTable(spark, str(tmp_path), "t1h",
                            stats_cols=("bucket_ts",))
        src.append(_turns(spark, ["a", "b"], minutes=120))
        cagg = ContinuousAggregate(src, tgt, "1h")
        assert cagg.refresh()["mode"] == "full"
        src.evolve_add_columns({"tool": "string"})
        # an evolve commit adds/removes no files: nothing dirties
        st = cagg.refresh()
        assert st["mode"] == "cursor_only"

    def test_compact_rewrites_with_evolved_schema(self, spark, table):
        table.evolve_add_columns({"tool": "string"})
        table.append(table.aligned(_turns(spark, ["k"], day=6)))
        table.compact(small_bytes=1 << 30)
        got = table.read()
        assert "tool" in got.columns and got.count() == 10


class TestReviewHardening:
    def test_aligned_rejects_unknown_columns(self, spark, table):
        bad = _turns(spark, ["q"]).withColumn("mystery", F.lit(1))
        with pytest.raises(ValueError, match="unknown to the snapshot"):
            table.aligned(bad)

    def test_cagg_raises_loudly_when_ts_evolved_away(self, spark, tmp_path):
        from feasts_spark.operators.continuous import ContinuousAggregate
        src = SnapshotTable(spark, str(tmp_path), "raw",
                            stats_cols=("ts",))
        tgt = SnapshotTable(spark, str(tmp_path), "t1h",
                            stats_cols=("bucket_ts",))
        src.append(_turns(spark, ["a"], minutes=120))
        cagg = ContinuousAggregate(src, tgt, "1h")
        assert cagg.refresh()["mode"] == "full"
        src.evolve_drop_columns("value")
        # force a recompute-classified change on the narrowed schema
        src.append(_turns(spark, ["b"], minutes=3, day=1).drop("value"))
        src.delete_below("ts", T0 + dt.timedelta(minutes=1))
        with pytest.raises(Exception):
            cagg.refresh()  # value_col gone: loud, not silently stale
