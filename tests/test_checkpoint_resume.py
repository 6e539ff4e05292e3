"""Lineage manifest + resume-from-checkpoint equality (north-rule component).

Simulates a killed run: process half the day-partitions, "crash", resume
with a new CheckpointedRun sharing the checkpoint dir, and verify (a) the
completed partitions are skipped, (b) the final output equals a clean
single-shot run exactly.
"""

import os

import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.rollup import rollup_raw
from feasts_spark.sources.tableio import TableIO
from feasts_spark.streaming.checkpoint import CheckpointedRun, checksum_df


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _partitions(events):
    return sorted(
        r["dt"].isoformat()
        for r in events.select(F.to_date("ts").alias("dt")).distinct().collect()
    )


def test_resume_equals_clean_run(spark, sf_dir, workdir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    io = TableIO(spark, workdir)
    parts = _partitions(events)[:8]  # 8 day-units keep the test fast
    assert len(parts) >= 4

    def make_process(out_name):
        def process(day):
            sub = events.filter(F.to_date("ts") == day)
            r = rollup_raw(sub, "1h", "user_id", "ts", "value").withColumn(
                "dt", F.lit(day)
            )
            io.overwrite_partitions(r, out_name, ("dt",))
            return checksum_df(r)

        return process

    # clean single-shot run
    clean = CheckpointedRun(spark, os.path.join(workdir, "ckpt_clean"))
    m = clean.run(parts, make_process("rollup_clean"))
    assert m["processed"] == len(parts)

    # interrupted run: first half, then crash
    ck_dir = os.path.join(workdir, "ckpt_resume")
    first = CheckpointedRun(spark, ck_dir)
    half = parts[: len(parts) // 2]
    m1 = first.run(half, make_process("rollup_resumed"))
    assert m1["processed"] == len(half)

    # resume with a fresh run object (new run_id, same checkpoint dir)
    second = CheckpointedRun(spark, ck_dir)
    assert second.completed_partitions() == set(half)
    m2 = second.run(parts, make_process("rollup_resumed"))
    assert m2["skipped"] == len(half)
    assert m2["processed"] == len(parts) - len(half)

    a = io.read("rollup_clean").drop("dt")
    b = io.read("rollup_resumed").drop("dt")
    assert checksum_df(a) == checksum_df(b)


def test_reprocessing_is_idempotent(spark, sf_dir, workdir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    io = TableIO(spark, workdir)
    parts = _partitions(events)[:2]

    def process(day):
        sub = events.filter(F.to_date("ts") == day)
        r = rollup_raw(sub, "1d", "user_id", "ts", "value").withColumn(
            "dt", F.lit(day)
        )
        io.overwrite_partitions(r, "rollup_idem", ("dt",))
        return checksum_df(r)

    run = CheckpointedRun(spark, os.path.join(workdir, "ck"))
    run.run(parts, process)
    before = checksum_df(io.read("rollup_idem"))
    # re-write the same partition (simulates retry after mid-write crash)
    process(parts[0])
    after = checksum_df(io.read("rollup_idem"))
    assert before == after


def test_rollup_job_dt_partitioned_input_matches_flat(spark, tmp_path, monkeypatch):
    """jobs/rollup_job.py with days(ts)-partitioned input (a `dt`
    partition column, the layout the job targets at scale) must produce
    byte-identical tier tables to the flat-input path — the pruned
    per-day scan may not change results, only IO."""
    import sys as _sys

    sys_path_added = "/root/repo" in _sys.path or _sys.path.insert(0, "/root/repo")
    from jobs.rollup_job import main

    from feasts_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(
        spark, n_convs=40, max_turns=300, seed=5, span_days=2,
        n_forced_long=1, forced_long_turns=500,
    )
    flat = str(tmp_path / "flat")
    part = str(tmp_path / "part")
    t.write.mode("overwrite").parquet(flat)
    t.withColumn("dt", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "dt"
    ).parquet(part)

    outs = {}
    for name, src in (("flat", flat), ("part", part)):
        out = str(tmp_path / f"wh_{name}")
        monkeypatch.setattr(
            _sys, "argv",
            ["rollup_job", "--input", src, "--output", out,
             "--tiers", "1m,1h"],
        )
        main()
        outs[name] = out

    for tier in ("1m", "1h"):
        a = (
            spark.read.parquet(f"{outs['flat']}/rollup_{tier}")
            .orderBy("series_key", "bucket_ts")
            .drop("dt")
        )
        b = (
            spark.read.parquet(f"{outs['part']}/rollup_{tier}")
            .orderBy("series_key", "bucket_ts")
            .drop("dt")
        )
        assert a.columns == b.columns
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        assert a.count() == b.count() > 0


def test_parallel_units_match_serial(spark, sf_dir, workdir):
    """max_parallel_units > 1 must produce the same outputs and a complete
    manifest — units write disjoint partitions, so concurrency may change
    only wall time, never bytes."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = _partitions(events)

    outs = {}
    for name, par in (("ser", 1), ("par", 3)):
        io = TableIO(spark, os.path.join(workdir, f"wh_{name}"))
        run = CheckpointedRun(spark, os.path.join(workdir, f"ck_{name}"))

        def process(day, io=io):
            sub = events.filter(F.to_date("ts") == day)
            r = rollup_raw(sub, "1h", "user_id", "ts", "value").withColumn(
                "dt", F.lit(day)
            )
            io.overwrite_partitions(r, "rollup_1h", ("dt",))
            return checksum_df(r)

        m = run.run(days, process, max_parallel_units=par)
        assert m["processed"] == len(days) and m["skipped"] == 0
        assert len(run.completed_partitions()) == len(days)
        outs[name] = io.read("rollup_1h")

    a, b = outs["ser"], outs["par"]
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_refresh_input_matches_full_rebuild(spark, tmp_path, monkeypatch):
    """jobs/rollup_job.py --refresh-input: base-build the on-time slice,
    then apply TWO successive late batches (with overlapping days — the
    second must not be skipped by the first's manifest rows) — every tier
    table must equal the full-corpus rebuild. The late data includes BOTH
    amendments to existing day partitions and a wholly-late day absent
    from the base build. Finally, a crash between a refresh unit's
    overwrite commit and its manifest append is simulated (the unit's
    manifest row is removed and the same batch re-run with the same
    run-id): the retry must reproduce the same bytes from the pre-refresh
    snapshot, not re-merge the batch into its own output."""
    import shutil
    import sys as _sys

    if "/root/repo" not in _sys.path:
        _sys.path.insert(0, "/root/repo")
    from jobs.rollup_job import main

    from feasts_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(
        spark, n_convs=40, max_turns=300, seed=11, span_days=2,
        n_forced_long=1, forced_long_turns=500,
    )
    day2 = t.select(F.max(F.to_date("ts"))).collect()[0][0]
    is_late = (F.to_date("ts") == day2) | (
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(10)) == 0
    )
    half = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2)) == 0
    paths = {n: str(tmp_path / n) for n in ("ontime", "late_a", "late_b",
                                            "full")}
    t.filter(~is_late).write.mode("overwrite").parquet(paths["ontime"])
    t.filter(is_late & half).write.mode("overwrite").parquet(paths["late_a"])
    t.filter(is_late & ~half).write.mode("overwrite").parquet(
        paths["late_b"])
    t.write.mode("overwrite").parquet(paths["full"])
    for n in ("late_a", "late_b"):
        assert spark.read.parquet(paths[n]).count() > 0

    wh_incr = str(tmp_path / "wh_incr")
    wh_full = str(tmp_path / "wh_full")

    def job(*argv):
        monkeypatch.setattr(_sys, "argv", ["rollup_job", *argv])
        main()

    job("--input", paths["ontime"], "--output", wh_incr, "--tiers", "1m,1h")
    job("--input", paths["ontime"], "--output", wh_incr, "--tiers", "1m,1h",
        "--refresh-input", paths["late_a"], "--run-id", "ra")
    job("--input", paths["ontime"], "--output", wh_incr, "--tiers", "1m,1h",
        "--refresh-input", paths["late_b"], "--run-id", "rb")
    job("--input", paths["full"], "--output", wh_full, "--tiers", "1m,1h")

    def assert_matches_full():
        for tier in ("1m", "1h"):
            a = spark.read.parquet(f"{wh_incr}/rollup_{tier}")
            b = spark.read.parquet(f"{wh_full}/rollup_{tier}")
            # float sums re-associate across the merge boundary: compare
            # rounded, everything else exact via exceptAll
            ra = a.withColumn("val_sum", F.round("val_sum", 6)).withColumn(
                "val_avg", F.round("val_avg", 6))
            rb = b.withColumn("val_sum", F.round("val_sum", 6)).withColumn(
                "val_avg", F.round("val_avg", 6))
            assert ra.exceptAll(rb).count() == 0
            assert rb.exceptAll(ra).count() == 0
            assert a.count() == b.count() > 0
            ca = spark.read.parquet(f"{wh_incr}/chunks_{tier}")
            cb = spark.read.parquet(f"{wh_full}/chunks_{tier}")
            assert ca.count() == cb.count() > 0

    assert_matches_full()

    # crash simulation: drop run rb's manifest rows (overwrites committed,
    # manifest append lost), then replay the same batch with the same
    # run-id — the snapshot makes the retry byte-stable
    manifest = f"{wh_incr}/_checkpoints/_manifest"
    kept = spark.read.parquet(manifest).filter("run_id <> 'rb'").collect()
    shutil.rmtree(manifest)
    from feasts_spark.streaming.checkpoint import MANIFEST_SCHEMA

    spark.createDataFrame(kept, MANIFEST_SCHEMA).coalesce(1).write.parquet(
        manifest)
    job("--input", paths["ontime"], "--output", wh_incr, "--tiers", "1m,1h",
        "--refresh-input", paths["late_b"], "--run-id", "rb")
    assert_matches_full()
