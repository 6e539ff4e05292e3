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


class TestRenameColumn:
    """Renames resolve by stable field ids (schema eras): old files keep
    their bytes and read through a per-era fid mapping; stats and blooms
    recorded under the old name still prune predicates on the new one."""

    def test_rename_reads_old_files_under_new_name(self, spark, table):
        files_before = {f["path"] for f in table.manifest()["files"]}
        v_pre = table.current_version()
        table.evolve_rename_column("value", "score")
        m = table.manifest()
        assert {f["path"] for f in m["files"]} == files_before  # no data IO
        got = table.read()
        assert "score" in got.columns and "value" not in got.columns
        assert sorted(r["score"] for r in got.collect()) == [
            0.0, 1.0, 2.0, 3.0, 4.0]
        # time travel shows the pre-rename shape
        assert "value" in table.read(version=v_pre).columns

    def test_rename_then_append_unions_eras(self, spark, table):
        table.evolve_rename_column("value", "score")
        new = _turns(spark, ["b"]).withColumnRenamed("value", "score")
        table.append(new)
        got = table.read()
        assert got.count() == 10
        per = {r["conv_id"]: r["s"] for r in
               got.groupBy("conv_id").agg(F.sum("score").alias("s")).collect()}
        assert per == {"a": 10.0, "b": 10.0}
        # both eras retained in the manifest's schema log
        m = table.manifest()
        assert len({f["sid"] for f in m["files"]}) == 2
        assert set(m["schemas"]) >= {str(s) for s in
                                     {f["sid"] for f in m["files"]}}

    def test_rename_then_reuse_old_name(self, spark, table):
        """A column ADDED with the renamed column's OLD name is a NEW
        field: old rows read NULL for it, and the old bytes map to the
        renamed field — name collision cannot resurrect old data."""
        table.evolve_rename_column("value", "score")
        table.evolve_add_columns({"value": "string"})
        got = table.read()
        rows = got.collect()
        assert all(r["value"] is None for r in rows)
        assert sorted(r["score"] for r in rows) == [0.0, 1.0, 2.0, 3.0, 4.0]

    def test_rename_prunes_with_old_name_stats(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "pr", stats_cols=("k",))
        t.append(spark.range(0, 4000, 1, 1).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")),
            target_files=8)
        t.evolve_rename_column("k", "key")
        m = t.manifest()
        nm = t._stat_lookup(m, "key")
        live = [f for f in m["files"]
                if f["min"].get(nm(f)) is None
                or not (f["max"][nm(f)] < 0 or f["min"][nm(f)] > 499)]
        assert 1 <= len(live) <= 2 < len(m["files"])
        got = t.read_where("key", 0, 499)
        assert got.count() == 500

    def test_rename_bloom_probe_translates(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "bl", stats_cols=("ts",),
                          bloom_cols=("conv_id",))
        t.append(_turns(spark, ["a"]))
        t.append(_turns(spark, ["b"]))
        t.evolve_rename_column("conv_id", "conversation")
        might, total = t.files_for_keys("conversation", ["b"])
        assert total == 2 and len(might) == 1
        got = t.read_containing("conversation", ["b"])
        assert set(r["conversation"] for r in got.collect()) == {"b"}

    def test_rename_replace_where_carries_and_rewrites(self, spark, table):
        table.append(_turns(spark, ["a"], day=1))
        table.evolve_rename_column("value", "score")
        lo, hi = T0 + dt.timedelta(days=1), T0 + dt.timedelta(days=1,
                                                              minutes=30)
        fixed = _turns(spark, ["a"], day=1) \
            .withColumnRenamed("value", "score") \
            .withColumn("score", F.col("score") + 100.0)
        before = {f["path"] for f in table.manifest()["files"]}
        table.replace_where(fixed, "ts", lo, hi)
        m = table.manifest()
        # the day-0 old-era file carried by reference, bitwise untouched
        assert any(f["path"] in before for f in m["files"])
        got = table.read()
        day0 = got.filter(F.col("ts") < F.lit(lo)).collect()
        day1 = got.filter(F.col("ts") >= F.lit(lo)).collect()
        assert sorted(r["score"] for r in day0) == [0.0, 1.0, 2.0, 3.0, 4.0]
        assert sorted(r["score"] for r in day1) == [100.0, 101.0, 102.0,
                                                    103.0, 104.0]

    def test_compact_upgrades_era(self, spark, table):
        table.append(_turns(spark, ["b"]))
        table.evolve_rename_column("value", "score")
        table.compact(min_group=2)
        m = table.manifest()
        assert {f["sid"] for f in m["files"]} == {m["schema_sid"]}
        assert table.read().count() == 10

    def test_rename_rejects_collision_and_absent(self, spark, table):
        with pytest.raises(ValueError, match="already exists"):
            table.evolve_rename_column("value", "ts")
        with pytest.raises(ValueError, match="absent"):
            table.evolve_rename_column("nope", "x")


class TestWidenColumn:
    def test_widen_casts_old_files(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "w", stats_cols=("k",))
        t.append(spark.range(5).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("float").alias("v")))
        t.evolve_widen_column("k", "long")
        t.evolve_widen_column("v", "double")
        got = t.read()
        assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
        assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 3, 4]
        # new writers append wide; aligned() upcasts a narrow legacy frame
        t.append(spark.range(5, 8).select(
            F.col("id").alias("k"), F.col("id").cast("double").alias("v")))
        legacy = spark.range(8, 10).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("float").alias("v"))
        t.append(t.aligned(legacy))
        assert t.read().count() == 10
        assert t.read_where("k", 8, 9).count() == 2

    def test_widen_rejects_lossy(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path), "w2", stats_cols=())
        t.append(spark.range(3).select(F.col("id").alias("k")))
        with pytest.raises(ValueError, match="not a lossless widening"):
            t.evolve_widen_column("k", "int")
        with pytest.raises(ValueError, match="not a lossless widening"):
            t.evolve_widen_column("k", "string")


class TestForeignFidHygiene:
    """A writer frame read from ANOTHER snapshot table carries that
    table's fid metadata; trusting it would seed this table with foreign
    ids and next_fid=0, letting a later ADD COLUMN mint a duplicate fid —
    era reads would then resurrect the wrong column's bytes. Field
    identity must be assigned by THIS table only."""

    def test_foreign_fids_are_stripped_on_first_commit(self, spark,
                                                       tmp_path):
        t1 = SnapshotTable(spark, str(tmp_path), "src", stats_cols=("k",))
        t1.append(spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
        t2 = SnapshotTable(spark, str(tmp_path), "dst", stats_cols=("k",))
        t2.append(t1.read())  # frame carries t1's fid metadata
        m = t2.manifest()
        sch = T.StructType.fromJson(__import__("json").loads(m["schema"]))
        fids = [f.metadata.get("fid") for f in sch.fields]
        assert sorted(fids) == [0, 1]
        assert m["next_fid"] == 2
        # the collision chain from the review: add + rename, then verify
        # old rows read NULL for the added column (not k's bytes)
        t2.evolve_add_columns({"x": "string"})
        t2.evolve_rename_column("v", "val")
        rows = t2.read().collect()
        assert all(r["x"] is None for r in rows)
        assert sorted(r["val"] for r in rows) == [0.0, 2.0, 4.0, 6.0, 8.0]
        assert sorted(r["k"] for r in rows) == [0, 1, 2, 3, 4]
