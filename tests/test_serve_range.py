"""jobs/serve_range.py: the warehouse read path. A stitched range
aggregate over the cagg tier tables must equal aggregating raw turns in
the range directly — from the committed heads, and (with --fresh)
including an un-refreshed raw tail via the real-time views."""

import json
import sys as _sys

from pyspark.sql import functions as F

if "/root/repo" not in _sys.path:
    _sys.path.insert(0, "/root/repo")

from jobs.cagg_job import main as cagg_main  # noqa: E402
from jobs.serve_range import main as serve_main  # noqa: E402

from feasts_spark.sources.snapshots import SnapshotTable  # noqa: E402
from feasts_spark.sources.transcripts import (  # noqa: E402
    synthesize_transcripts, turn_series,
)


def _run(monkeypatch, capsys, main, name, *argv) -> dict:
    monkeypatch.setattr(_sys, "argv", [name, *argv])
    main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _direct(raw_df, start, end):
    ts, v = F.col("ts"), F.col("value")
    return (
        raw_df.filter((ts >= F.lit(start)) & (ts < F.lit(end)))
        .groupBy(F.col("conv_id").alias("series_key"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(v).alias("val_sum"),
            F.min(v).alias("val_min"),
            F.max(v).alias("val_max"),
            F.min_by(v, ts).alias("val_first"),
            F.max_by(v, ts).alias("val_last"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .withColumn("val_avg", F.col("val_sum") / F.col("n_points"))
    )


def _assert_equal(got, exp):
    def r(df):
        return df.withColumn("val_sum", F.round("val_sum", 8)) \
                 .withColumn("val_avg", F.round("val_avg", 8))
    got, exp = r(got), r(exp)
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


class TestServeRange:
    def test_committed_and_fresh(self, spark, tmp_path, monkeypatch,
                                 capsys):
        import datetime as dt

        t = synthesize_transcripts(
            spark, n_convs=16, max_turns=120, seed=11, span_days=3,
            n_forced_long=0,
        )
        days = sorted(
            r[0].isoformat()
            for r in t.select(F.to_date("ts")).distinct().collect()
        )
        p1 = str(tmp_path / "b1")
        p2 = str(tmp_path / "b2")
        t.filter(F.to_date("ts") == days[0]).write.parquet(p1)
        t.filter(F.to_date("ts") > days[0]).write.parquet(p2)
        root = str(tmp_path / "wh")

        _run(monkeypatch, capsys, cagg_main, "cagg", "--table-root", root,
             "--ingest", p1, "--ingest-id", "d1", "--tiers", "1m,1h,1d")

        start = dt.datetime.fromisoformat(days[0]) + dt.timedelta(
            hours=2, minutes=17)
        end = dt.datetime.fromisoformat(days[0]) + dt.timedelta(
            hours=23, minutes=43)
        sargs = ["--table-root", root, "--start",
                 start.strftime("%Y-%m-%d %H:%M"),
                 "--end", end.strftime("%Y-%m-%d %H:%M")]

        raw = SnapshotTable(spark, root, "raw_turns", stats_cols=("ts",))
        out1 = str(tmp_path / "out1")
        rep = _run(monkeypatch, capsys, serve_main, "serve",
                   *sargs, "--out", out1)
        assert set(rep["tier_modes"].values()) == {"committed"}
        _assert_equal(spark.read.parquet(out1),
                      _direct(raw.read(), start, end))

        # second batch lands but is NOT refreshed into the tiers:
        # committed serve misses it, --fresh serve includes it
        batch2 = turn_series(spark.read.parquet(p2))
        raw.append(batch2)
        out2 = str(tmp_path / "out2")
        end2 = dt.datetime.fromisoformat(days[-1]) + dt.timedelta(days=1)
        sargs2 = ["--table-root", root, "--start",
                  start.strftime("%Y-%m-%d %H:%M"),
                  "--end", end2.strftime("%Y-%m-%d %H:%M")]
        rep2 = _run(monkeypatch, capsys, serve_main, "serve",
                    *sargs2, "--out", out2)
        n_committed = spark.read.parquet(out2).agg(
            F.sum("n_points")).first()[0]

        out3 = str(tmp_path / "out3")
        rep3 = _run(monkeypatch, capsys, serve_main, "serve",
                    *sargs2, "--out", out3, "--fresh")
        assert rep3["tier_modes"]["1m"] == "merge"
        assert rep3["tier_modes"]["1d"] == "cascaded_from_1h"
        fresh = spark.read.parquet(out3)
        assert fresh.agg(F.sum("n_points")).first()[0] > n_committed
        _assert_equal(fresh, _direct(raw.read(), start, end2))
