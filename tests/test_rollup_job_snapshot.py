"""jobs/rollup_job.py --table-format snapshot: the deployment job writing
versioned manifest tables instead of parquet partition dirs. Same tier
bytes as the partition format, plus atomic per-day commits, pinned-version
refresh (no checkpoint-dir copy), metadata-only retention, and snapshot
expiry."""

import json
import os
import sys as _sys

from pyspark.sql import functions as F

if "/root/repo" not in _sys.path:
    _sys.path.insert(0, "/root/repo")

from jobs.rollup_job import main  # noqa: E402

from feasts_spark.sources.snapshots import SnapshotIO  # noqa: E402
from feasts_spark.sources.transcripts import synthesize_transcripts  # noqa: E402


def _job(monkeypatch, *argv):
    monkeypatch.setattr(_sys, "argv", ["rollup_job", *argv])
    main()


def _tiers_equal(a, b):
    cols = sorted(set(a.columns) & set(b.columns))
    a, b = a.select(*cols), b.select(*cols)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _src(spark, tmp_path, **kw):
    t = synthesize_transcripts(
        spark, n_convs=20, max_turns=150, seed=11, span_days=3,
        n_forced_long=1, forced_long_turns=300, **kw
    )
    src = str(tmp_path / "src")
    t.write.mode("overwrite").parquet(src)
    return t, src


class TestSnapshotFormatBuild:
    def test_matches_partition_format(self, spark, tmp_path, monkeypatch):
        _, src = _src(spark, tmp_path)
        out_p = str(tmp_path / "wh_part")
        out_s = str(tmp_path / "wh_snap")
        _job(monkeypatch, "--input", src, "--output", out_p,
             "--tiers", "1m,1h")
        _job(monkeypatch, "--input", src, "--output", out_s,
             "--tiers", "1m,1h", "--table-format", "snapshot")

        io = SnapshotIO(spark, out_s)
        for tier in ("1m", "1h"):
            _tiers_equal(
                spark.read.parquet(f"{out_p}/rollup_{tier}").drop("dt"),
                io.read(f"rollup_{tier}").drop("dt"),
            )
            _tiers_equal(
                spark.read.parquet(f"{out_p}/chunks_{tier}")
                .drop("dt", "payload", "tag_idx"),
                io.read(f"chunks_{tier}").drop("dt", "payload", "tag_idx"),
            )
            # one atomic commit per day unit, with file stats harvested
            t = io.table(f"rollup_{tier}")
            h = t.history()
            assert len(h) >= 3  # 3 span days
            assert all(r["operation"] == "replace" for r in h)
            m = t.manifest()
            assert all(f["min"].get("dt") == f["max"].get("dt")
                       for f in m["files"])
            assert all(f["min"].get("bucket_ts") is not None
                       for f in m["files"])

    def test_parallel_units_commit_through_conflicts(
        self, spark, tmp_path, monkeypatch
    ):
        """Concurrent day units race on the manifest pointer; losers
        restage and retry. Results must equal the serial run."""
        _, src = _src(spark, tmp_path)
        outs = {}
        for name, par in (("ser", "1"), ("par", "3")):
            out = str(tmp_path / f"wh_{name}")
            _job(monkeypatch, "--input", src, "--output", out,
                 "--tiers", "1m", "--table-format", "snapshot",
                 "--unit-parallelism", par)
            outs[name] = SnapshotIO(spark, out).read("rollup_1m")
        _tiers_equal(outs["ser"], outs["par"])


class TestSnapshotRefresh:
    def test_refresh_matches_full_rebuild_with_time_travel(
        self, spark, tmp_path, monkeypatch
    ):
        t, _ = _src(spark, tmp_path)
        on_time = t.filter(F.col("turn_idx") % 311 != 5)
        late = t.filter(F.col("turn_idx") % 311 == 5)
        assert late.count() > 0
        src_on = str(tmp_path / "on_time")
        src_late = str(tmp_path / "late")
        src_all = str(tmp_path / "all")
        on_time.write.mode("overwrite").parquet(src_on)
        late.write.mode("overwrite").parquet(src_late)
        t.write.mode("overwrite").parquet(src_all)

        out = str(tmp_path / "wh")
        _job(monkeypatch, "--input", src_on, "--output", out,
             "--tiers", "1m,1h", "--table-format", "snapshot")
        io = SnapshotIO(spark, out)
        t0 = io.table("rollup_1m")
        v_base = t0.current_version()
        base_rows = t0.read().count()

        _job(monkeypatch, "--input", src_on, "--output", out,
             "--tiers", "1m,1h", "--table-format", "snapshot",
             "--refresh-input", src_late, "--run-id", "refresh-b1")
        # the pinned-version path must not create the partition-format
        # checkpoint-dir copy
        assert not os.path.exists(
            os.path.join(out, "_checkpoints", "refresh_snapshots")
        )

        out_full = str(tmp_path / "wh_full")
        _job(monkeypatch, "--input", src_all, "--output", out_full,
             "--tiers", "1m,1h", "--table-format", "snapshot")
        io_full = SnapshotIO(spark, out_full)
        for tier in ("1m", "1h"):
            _tiers_equal(io.read(f"rollup_{tier}"),
                         io_full.read(f"rollup_{tier}"))
        # time travel: the pre-refresh tier is still exactly readable
        assert t0.read(version=v_base).count() == base_rows

    def test_refresh_retry_reads_pinned_base(self, spark, tmp_path,
                                             monkeypatch):
        """Re-running the same refresh run_id (crash-retry shape) must be
        a no-op on bytes: completed units skip via the manifest, and the
        persisted version pin guarantees any re-executed unit would read
        the same pre-refresh base."""
        t, _ = _src(spark, tmp_path)
        on_time = t.filter(F.col("turn_idx") % 311 != 5)
        late = t.filter(F.col("turn_idx") % 311 == 5)
        src_on = str(tmp_path / "on_time")
        src_late = str(tmp_path / "late")
        on_time.write.mode("overwrite").parquet(src_on)
        late.write.mode("overwrite").parquet(src_late)

        out = str(tmp_path / "wh")
        _job(monkeypatch, "--input", src_on, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot")
        args = ("--input", src_on, "--output", out, "--tiers", "1m",
                "--table-format", "snapshot", "--refresh-input", src_late,
                "--run-id", "refresh-b1", "--resume")
        _job(monkeypatch, *args)
        io = SnapshotIO(spark, out)
        pin = os.path.join(out, "_checkpoints", "refresh_base_version",
                           "refresh-b1.json")
        with open(pin) as f:
            pinned = json.load(f)["version"]
        v_after = io.table("rollup_1m").current_version()
        assert pinned < v_after
        rows = io.read("rollup_1m")
        n1 = rows.count()
        _job(monkeypatch, *args)  # retry: all units skip
        assert io.table("rollup_1m").current_version() == v_after
        assert io.read("rollup_1m").count() == n1


class TestSnapshotRetention:
    def test_retention_is_a_metadata_commit(self, spark, tmp_path,
                                            monkeypatch):
        t, src = _src(spark, tmp_path)
        out = str(tmp_path / "wh")
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot")
        io = SnapshotIO(spark, out)
        t0 = io.table("rollup_1m")
        v_pre = t0.current_version()
        files_pre = {f["path"] for f in t0.manifest()["files"]}
        days_pre = t0.read().select("dt").distinct().count()

        # second invocation: retention pass (tight policy ages out the
        # oldest of the 3 span days)
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot", "--resume",
             "--retention", "--retention-policy", '{"1m": "2 days"}')
        m = t0.manifest()
        assert m["operation"] == "delete"
        # aged days dropped without rewriting anything: survivors are a
        # subset of the pre-retention files
        assert {f["path"] for f in m["files"]} < files_pre
        assert m["summary"]["rewritten_files"] == 0
        assert t0.read().select("dt").distinct().count() < days_pre
        # pre-retention snapshot still time-travels
        assert t0.read(version=v_pre).select("dt").distinct().count() \
            == days_pre

    def test_expire_keep_reclaims_files(self, spark, tmp_path, monkeypatch):
        _, src = _src(spark, tmp_path)
        out = str(tmp_path / "wh")
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot")
        io = SnapshotIO(spark, out)
        n_manifests = len(io.table("rollup_1m").history())
        assert n_manifests >= 3
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot", "--resume",
             "--expire-keep", "1")
        t0 = io.table("rollup_1m")
        assert len(t0.history()) == 1
        assert t0.read().count() > 0


class TestMaintenanceCompaction:
    def test_compact_recluster_flag(self, spark, tmp_path, monkeypatch,
                                    capsys):
        """--compact-small-mb bin-packs each snapshot table's per-day
        commit files; --compact-recluster re-sorts them through the
        table's clustering. Content identical, commit log records it."""
        _, src = _src(spark, tmp_path)
        out = str(tmp_path / "wh")
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot")
        io = SnapshotIO(spark, out)
        before = io.read("rollup_1m").groupBy().agg(
            F.sum("val_sum").alias("s"), F.count("*").alias("n")).first()
        n_files_before = len(io.table("rollup_1m").manifest()["files"])
        capsys.readouterr()
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot", "--resume",
             "--compact-small-mb", "1024", "--compact-recluster")
        metrics = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["compacted"]["rollup_1m"] is not None
        io2 = SnapshotIO(spark, out)
        t = io2.table("rollup_1m")
        assert t.manifest()["operation"] == "compact"
        assert t.manifest()["summary"]["reclustered"] is True
        assert len(t.manifest()["files"]) < n_files_before
        after = io2.read("rollup_1m").groupBy().agg(
            F.sum("val_sum").alias("s"), F.count("*").alias("n")).first()
        assert after["n"] == before["n"]
        assert abs(after["s"] - before["s"]) < 1e-6


class TestJobTagging:
    def test_tag_then_expire_protects_pin(self, spark, tmp_path,
                                          monkeypatch, capsys):
        """--tag pins every table's head and --expire-keep in the SAME
        invocation cannot reclaim the pinned versions (tagging runs
        before expiry)."""
        _, src = _src(spark, tmp_path)
        out = str(tmp_path / "wh")
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot")
        capsys.readouterr()
        _job(monkeypatch, "--input", src, "--output", out,
             "--tiers", "1m", "--table-format", "snapshot", "--resume",
             "--compact-small-mb", "1024", "--tag", "corpus-v1",
             "--expire-keep", "1")
        metrics = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["tagged"]["rollup_1m"] > 0
        io = SnapshotIO(spark, out)
        t = io.table("rollup_1m")
        assert t.read(tag="corpus-v1").count() == t.read().count() > 0
