"""jobs/cagg_job.py: the continuous-aggregate deployment tick. Each
invocation ingests a landed batch idempotently and refreshes every tier
(plus the feature view) from its cursor; re-running a tick changes
nothing; tiers always equal a from-scratch rollup of the raw table."""

import json
import sys as _sys

from pyspark.sql import functions as F

if "/root/repo" not in _sys.path:
    _sys.path.insert(0, "/root/repo")

from jobs.cagg_job import main  # noqa: E402

from feasts_spark.operators.features import features  # noqa: E402
from feasts_spark.operators.rollup import rollup_raw  # noqa: E402
from feasts_spark.sources.snapshots import SnapshotTable  # noqa: E402
from feasts_spark.sources.transcripts import (  # noqa: E402
    synthesize_transcripts, turn_series,
)


def _job(monkeypatch, capsys, *argv) -> dict:
    monkeypatch.setattr(_sys, "argv", ["cagg_job", *argv])
    main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _corpus(spark, tmp_path):
    t = synthesize_transcripts(
        spark, n_convs=24, max_turns=160, seed=7, span_days=3,
        n_forced_long=1, forced_long_turns=320,
    )
    days = sorted(
        r[0].isoformat()
        for r in t.select(F.to_date("ts")).distinct().collect()
    )
    paths = []
    for i, d in enumerate(days[:2]):
        p = str(tmp_path / f"batch_{d}")
        t.filter(F.to_date("ts") == d).write.parquet(p)
        paths.append((d, p))
    return paths


def _tier_equals_raw(spark, root, tier):
    raw = SnapshotTable(spark, root, "raw_turns", stats_cols=("ts",))
    tgt = SnapshotTable(spark, root, f"tier_{tier}",
                        stats_cols=("bucket_ts",))
    exp = rollup_raw(raw.read(), tier) \
        .withColumn("val_sum", F.round("val_sum", 9)) \
        .withColumn("val_avg", F.round("val_avg", 9))
    got = tgt.read() \
        .withColumn("val_sum", F.round("val_sum", 9)) \
        .withColumn("val_avg", F.round("val_avg", 9))
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


class TestCaggJob:
    def test_two_ticks_then_idempotent_rerun(self, spark, tmp_path,
                                             monkeypatch, capsys):
        batches = _corpus(spark, tmp_path)
        root = str(tmp_path / "wh")

        d1, p1 = batches[0]
        out1 = _job(monkeypatch, capsys, "--table-root", root,
                    "--ingest", p1, "--ingest-id", d1,
                    "--tiers", "1m,1h", "--features",
                    "--min-series-len", "5", "--feature-period", "4")
        assert out1["steps"]["ingest"] == {
            "ingest_id": d1, "skipped": False, "version": 1}
        assert out1["steps"]["tier_1h"]["mode"] == "full"
        assert out1["steps"]["features"]["mode"] == "full"
        for tier in ("1m", "1h"):
            _tier_equals_raw(spark, root, tier)

        d2, p2 = batches[1]
        out2 = _job(monkeypatch, capsys, "--table-root", root,
                    "--ingest", p2, "--ingest-id", d2,
                    "--tiers", "1m,1h", "--features",
                    "--min-series-len", "5", "--feature-period", "4")
        assert out2["steps"]["ingest"]["skipped"] is False
        assert out2["steps"]["tier_1m"]["mode"] == "merge"
        assert out2["steps"]["tier_1m"]["refreshed_from"] == "raw_turns"
        # 1h cascades off the 1m TABLE, whose tick-2 commits are
        # replaces -> recompute of the dirty coarse buckets
        assert out2["steps"]["tier_1h"]["mode"] == "recompute"
        assert out2["steps"]["tier_1h"]["refreshed_from"] == "tier_1m"
        assert out2["steps"]["features"]["mode"] == "incremental"
        for tier in ("1m", "1h"):
            _tier_equals_raw(spark, root, tier)

        # feature view == batch features over the full raw table
        raw = SnapshotTable(spark, root, "raw_turns", stats_cols=("ts",))
        ftg = SnapshotTable(spark, root, "features", stats_cols=("_kb",))
        exp = features(raw.read(), key_col="conv_id", order_col="ts",
                       value_col="value", period=4, min_points=5)
        got = ftg.read().drop("_kb")
        assert got.count() == exp.count() > 0
        assert got.exceptAll(exp).count() == 0

        # replay the SAME tick (crash-retry shape): ingest skipped,
        # refreshes no-op, nothing changes anywhere
        v_raw = raw.current_version()
        v_ftg = ftg.current_version()
        out3 = _job(monkeypatch, capsys, "--table-root", root,
                    "--ingest", p2, "--ingest-id", d2,
                    "--tiers", "1m,1h", "--features",
                    "--min-series-len", "5", "--feature-period", "4")
        assert out3["steps"]["ingest"]["skipped"] is True
        assert out3["steps"]["tier_1h"]["mode"] == "noop"
        assert out3["steps"]["features"]["mode"] == "noop"
        assert raw.current_version() == v_raw
        assert ftg.current_version() == v_ftg

    def test_refresh_only_tick_noops_without_new_data(
            self, spark, tmp_path, monkeypatch, capsys):
        batches = _corpus(spark, tmp_path)
        root = str(tmp_path / "wh2")
        d1, p1 = batches[0]
        _job(monkeypatch, capsys, "--table-root", root,
             "--ingest", p1, "--ingest-id", d1, "--tiers", "1m")
        out = _job(monkeypatch, capsys, "--table-root", root,
                   "--tiers", "1m")
        assert out["steps"]["tier_1m"]["mode"] == "noop"


class TestWapIngest:
    def test_wap_tick_publishes_clean_batch(self, spark, tmp_path,
                                            monkeypatch, capsys):
        root = str(tmp_path / "wh")
        (day, path), *_ = _corpus(spark, tmp_path)
        out = _job(monkeypatch, capsys, "--table-root", root,
                   "--ingest", path, "--ingest-id", day,
                   "--tiers", "1m,1h", "--wap")
        assert out["steps"]["ingest"]["version"] == 1
        _tier_equals_raw(spark, root, "1h")
        raw = SnapshotTable(spark, root, "raw_turns", stats_cols=("ts",))
        s = raw.manifest(1)["summary"]
        assert s["ingest_id"] == day and "staged_id" in s
        # idempotent re-run of the same tick: no second version
        out2 = _job(monkeypatch, capsys, "--table-root", root,
                    "--ingest", path, "--ingest-id", day,
                    "--tiers", "1m,1h", "--wap")
        assert out2["steps"]["ingest"]["skipped"] is True
        assert raw.current_version() == 1

    def test_wap_vetoes_malformed_batch_then_recovers(
            self, spark, tmp_path, monkeypatch, capsys):
        import pytest as _pt

        root = str(tmp_path / "wh")
        (day, path), *_ = _corpus(spark, tmp_path)
        raw_batch = spark.read.parquet(path)
        # duplicate (conv_id, turn_idx) keys: union the batch with itself
        bad_path = str(tmp_path / "bad_batch")
        raw_batch.unionByName(raw_batch).write.parquet(bad_path)
        with _pt.raises(SystemExit) as ex:
            _job(monkeypatch, capsys, "--table-root", root,
                 "--ingest", bad_path, "--ingest-id", day,
                 "--tiers", "1m", "--wap")
        assert ex.value.code == 2
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        ing = out["steps"]["ingest"]
        assert "dup_turn_keys" in ing["audit_failed"]
        raw = SnapshotTable(spark, root, "raw_turns", stats_cols=("ts",))
        assert raw.current_version() == 0  # nothing became visible
        # staged evidence retained
        assert raw.staged_manifest(ing["staged_id"])["files"]
        # corrected re-run with the SAME ingest id goes through
        out2 = _job(monkeypatch, capsys, "--table-root", root,
                    "--ingest", path, "--ingest-id", day,
                    "--tiers", "1m", "--wap")
        assert out2["steps"]["ingest"]["version"] == 1
        _tier_equals_raw(spark, root, "1m")


class TestAuditTurns:
    def test_clean_batch_counts(self, spark, tmp_path):
        from feasts_spark.operators.integrity import audit_turns

        t = synthesize_transcripts(spark, n_convs=4, max_turns=30, seed=3)
        c = audit_turns(t)
        assert c["rows"] == t.count() and c["dup_turn_keys"] == 0

    def test_each_violation_class_raises(self, spark):
        import pytest as _pt
        from feasts_spark.operators.integrity import audit_turns

        base = "conv_id string, turn_idx int, ts timestamp"
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        cases = {
            "null_conv_id": [(None, 0, t0)],
            "bad_turn_idx": [("c", -1, t0)],
            "null_ts": [("c", 0, None)],
            "dup_turn_keys": [("c", 0, t0), ("c", 0, t0)],
        }
        for key, rows in cases.items():
            df = spark.createDataFrame(rows, base)
            with _pt.raises(ValueError, match=key):
                audit_turns(df)

    def test_empty_batch_is_clean(self, spark):
        from feasts_spark.operators.integrity import audit_turns

        df = spark.createDataFrame(
            [], "conv_id string, turn_idx int, ts timestamp")
        assert audit_turns(df)["rows"] == 0


class TestTickTagging:
    def test_tag_pins_tick_state_across_later_ticks(self, spark, tmp_path,
                                                    monkeypatch, capsys):
        """--tag after a tick pins every table's head; a later tick with
        the same tag MOVES it, and reading the old pin still returns the
        first tick's state (needs tagging an explicit version)."""
        batches = _corpus(spark, tmp_path)
        root = str(tmp_path / "wh")
        d1, p1 = batches[0]
        out1 = _job(monkeypatch, capsys, "--table-root", root,
                    "--ingest", p1, "--ingest-id", d1,
                    "--tiers", "1m,1h", "--tag", "tick")
        assert set(out1["steps"]["tagged"]) >= {"raw_turns", "tier_1m",
                                                "tier_1h"}
        raw = SnapshotTable(spark, root, "raw_turns", stats_cols=("ts",))
        n1 = raw.read(tag="tick").count()
        # pin tick-1 permanently before the tag moves
        v1 = raw.tags()["tick"]
        raw.tag("run-1", version=v1)
        d2, p2 = batches[1]
        _job(monkeypatch, capsys, "--table-root", root,
             "--ingest", p2, "--ingest-id", d2,
             "--tiers", "1m,1h", "--tag", "tick")
        assert raw.read(tag="tick").count() > n1
        assert raw.read(tag="run-1").count() == n1
