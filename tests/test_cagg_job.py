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
