"""stream_time_weighted: finalize(streamed partials) must equal the batch
time_weighted operator on bounded in-order input, segments must bridge
micro-batch boundaries via the carried last sample, and stale/duplicate
rows must degrade exactly as documented."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.timeweight import time_weighted
from feasts_spark.streaming.timeweight_stream import (
    finalize_time_weighted,
    stream_time_weighted,
)

SCHEMA = "series_key string, ts timestamp, value double"


def _chunks(pdf, n):
    """Contiguous row chunks (np.array_split on a DataFrame is
    deprecated)."""
    return [pdf.iloc[ix] for ix in np.array_split(np.arange(len(pdf)), n)]


def _corpus():
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-05-01")
    rows = []
    for key in ("a", "b"):
        # irregular cadence: mixed 1-40 minute steps over ~8 hours
        t = 0.0
        while t < 8 * 60:
            rows.append((key, base + pd.Timedelta(minutes=t),
                         float(rng.normal(20, 4))))
            t += float(rng.uniform(1, 40))
    pdf = pd.DataFrame(rows, columns=["series_key", "ts", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf.sort_values("ts", ignore_index=True)


def _run(spark, tmp_path, pdf, n_files=5, name="t_twa_stream"):
    d = tmp_path / "in"
    d.mkdir()
    for i, part in enumerate(_chunks(pdf, n_files)):
        part.to_parquet(d / f"b{i:02d}.parquet", index=False)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (stream_time_weighted(stream, "1h", watermark="30 minutes")
         .writeStream.outputMode("append").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


class TestStreamTimeWeighted:
    def test_finalize_equals_batch(self, spark, tmp_path):
        pdf = _corpus()
        partials = _run(spark, tmp_path, pdf)
        got = finalize_time_weighted(partials) \
            .orderBy("series_key", "bucket_ts").toPandas()
        batch = time_weighted(spark.createDataFrame(pdf), "1h") \
            .orderBy("series_key", "bucket_ts").toPandas()[got.columns]
        assert len(got) == len(batch) > 0
        pd.testing.assert_frame_equal(
            got[["series_key", "bucket_ts", "covered_us"]]
            .reset_index(drop=True),
            batch[["series_key", "bucket_ts", "covered_us"]]
            .reset_index(drop=True), check_exact=True)
        np.testing.assert_allclose(got["twa_locf"], batch["twa_locf"],
                                   rtol=1e-12)
        np.testing.assert_allclose(got["twa_linear"], batch["twa_linear"],
                                   rtol=1e-12)

    def test_segments_bridge_micro_batches(self, spark, tmp_path):
        # 2 samples per file: every second segment spans a batch boundary
        base = pd.Timestamp("2024-05-01")
        pdf = pd.DataFrame({
            "series_key": ["a"] * 8,
            "ts": [base + pd.Timedelta(minutes=40 * i) for i in range(8)],
            "value": [float(i) for i in range(8)],
        })
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        partials = _run(spark, tmp_path, pdf, n_files=4,
                        name="t_twa_bridge")
        got = finalize_time_weighted(partials)
        # 7 closed segments cover 40*7 minutes continuously
        assert got.agg(F.sum("covered_us")).collect()[0][0] \
            == 7 * 40 * 60 * 1_000_000

    def test_duplicate_and_stale_rows_drop(self, spark, tmp_path):
        base = pd.Timestamp("2024-05-01")
        f1 = pd.DataFrame({
            "series_key": ["a", "a"],
            "ts": [base, base + pd.Timedelta(minutes=30)],
            "value": [1.0, 2.0],
        })
        # second file: one duplicate of the carried endpoint, one stale
        # (earlier) row, one genuine continuation
        f2 = pd.DataFrame({
            "series_key": ["a", "a", "a"],
            "ts": [base + pd.Timedelta(minutes=30),
                   base + pd.Timedelta(minutes=10),
                   base + pd.Timedelta(minutes=50)],
            "value": [99.0, 99.0, 3.0],
        })
        d = tmp_path / "in"
        d.mkdir()
        for i, part in enumerate((f1, f2)):
            part = part.copy()
            part["ts"] = part["ts"].astype("datetime64[us]")
            part.to_parquet(d / f"b{i}.parquet", index=False)
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        q = (stream_time_weighted(stream, "1h", watermark="2 hours")
             .writeStream.outputMode("append").format("memory")
             .queryName("t_twa_stale").trigger(availableNow=True).start())
        q.awaitTermination()
        got = finalize_time_weighted(
            spark.sql("SELECT * FROM t_twa_stale")).collect()
        assert len(got) == 1
        r = got[0]
        # segments: [0,30)@v1 and [30,50)@v2 — stale/duplicate dropped
        assert r.covered_us == 50 * 60 * 1_000_000
        assert r.twa_locf == pytest.approx((30 * 1.0 + 20 * 2.0) / 50)


class TestStreamDurationInState:
    def test_partials_sum_equals_batch(self, spark, tmp_path):
        from feasts_spark.operators.timeweight import duration_in_state
        from feasts_spark.streaming.timeweight_stream import (
            stream_duration_in_state,
        )
        base = pd.Timestamp("2024-05-01")
        rng = np.random.default_rng(5)
        rows = []
        for key in ("a", "b"):
            t = 0.0
            while t < 5 * 60:
                rows.append((key, base + pd.Timedelta(minutes=t),
                             str(rng.choice(["idle", "busy", "tool"]))))
                t += float(rng.uniform(2, 25))
        pdf = pd.DataFrame(rows, columns=["series_key", "ts", "state"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf = pdf.sort_values("ts", ignore_index=True)
        d = tmp_path / "in"
        d.mkdir()
        for i, part in enumerate(_chunks(pdf, 4)):
            part.to_parquet(d / f"b{i}.parquet", index=False)
        stream = (spark.readStream
                  .schema("series_key string, ts timestamp, state string")
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        q = (stream_duration_in_state(stream, "1h",
                                      watermark="30 minutes")
             .writeStream.outputMode("append").format("memory")
             .queryName("t_dis_stream").trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.sql("SELECT * FROM t_dis_stream")
               .groupBy("series_key", "bucket_ts", "state")
               .agg(F.sum("w_us").alias("state_us"))
               .orderBy("series_key", "bucket_ts", "state").toPandas())
        batch = duration_in_state(spark.createDataFrame(pdf), "1h") \
            .orderBy("series_key", "bucket_ts", "state") \
            .toPandas()[got.columns]
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      batch.reset_index(drop=True),
                                      check_exact=True)


class TestTranscriptRoleOccupancy:
    def test_role_occupancy_over_synthesized_transcripts(self, spark):
        """The north-rule input shape end-to-end: wall-clock per role per
        conversation-hour over synthesized transcripts, via the generic
        state-occupancy operator."""
        from feasts_spark.operators.timeweight import (
            duration_in_state, state_top,
        )
        from feasts_spark.sources.transcripts import synthesize_transcripts

        tr = synthesize_transcripts(spark, n_convs=30, max_turns=3000)
        assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} \
            <= set(tr.columns)
        occ = duration_in_state(tr, "1h", key_col="conv_id",
                                ts_col="ts", state_col="role",
                                tie_col="turn_idx")
        tot = occ.agg(F.sum("state_us")).collect()[0][0]
        assert tot and tot > 0
        top = state_top(tr, "1h", key_col="conv_id", ts_col="ts",
                        state_col="role", tie_col="turn_idx")
        r = top.first()
        assert r.state_top in ("user", "assistant", "system", "tool")
        # occupancy partitions the covered wall-clock exactly
        per_bucket = occ.groupBy("series_key", "bucket_ts") \
            .agg(F.sum("state_us").alias("s"))
        joined = per_bucket.join(
            top.select("series_key", "bucket_ts", "state_top_us"),
            ["series_key", "bucket_ts"])
        assert joined.filter(
            F.col("state_top_us") > F.col("s")).count() == 0


class TestPartialsThroughSnapshotSink:
    def test_sink_then_finalize_equals_batch(self, spark, tmp_path):
        """Streamed partials -> exactly-once snapshot sink -> finalize at
        read time. Partials merge by SUM across micro-batch commits, so
        the sink needs no merge logic at all — append-only commits
        suffice even when later batches add weight to an already-written
        bucket."""
        from feasts_spark.sources.snapshots import SnapshotTable
        from feasts_spark.streaming.snapshot_sink import (
            snapshot_batch_writer,
        )

        pdf = _corpus()
        d = tmp_path / "in"
        d.mkdir()
        for i, part in enumerate(_chunks(pdf, 5)):
            part.to_parquet(d / f"b{i}.parquet", index=False)
        table = SnapshotTable(spark, str(tmp_path), "twa_partials",
                              stats_cols=("bucket_ts",))
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        q = (stream_time_weighted(stream, "1h", watermark="30 minutes")
             .writeStream
             .foreachBatch(snapshot_batch_writer(table, "twa"))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        assert all(h["operation"] == "append" for h in table.history())

        got = finalize_time_weighted(table.read()) \
            .orderBy("series_key", "bucket_ts").toPandas()
        batch = time_weighted(spark.createDataFrame(pdf), "1h") \
            .orderBy("series_key", "bucket_ts").toPandas()[got.columns]
        assert len(got) == len(batch) > 0
        assert (got["covered_us"] == batch["covered_us"]).all()
        np.testing.assert_allclose(got["twa_locf"], batch["twa_locf"],
                                   rtol=1e-12)
        np.testing.assert_allclose(got["twa_linear"],
                                   batch["twa_linear"], rtol=1e-12)


class TestStreamSanitation:
    def _run_files(self, spark, tmp_path, frames, name, **kw):
        d = tmp_path / "in"
        d.mkdir()
        for i, part in enumerate(frames):
            part = part.copy()
            part["ts"] = part["ts"].astype("datetime64[us]")
            part.to_parquet(d / f"b{i}.parquet", index=False)
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        q = (stream_time_weighted(stream, "1h", watermark="2 hours", **kw)
             .writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
        return finalize_time_weighted(spark.sql(f"SELECT * FROM {name}"))

    def test_null_event_times_dropped_not_poisoning(self, spark, tmp_path):
        base = pd.Timestamp("2024-05-01")
        f1 = pd.DataFrame({
            "series_key": ["a", "a", "a"],
            "ts": [base, pd.NaT, base + pd.Timedelta(minutes=30)],
            "value": [1.0, 50.0, 2.0],
        })
        f2 = pd.DataFrame({
            "series_key": ["a"],
            "ts": [base + pd.Timedelta(minutes=40)],
            "value": [3.0],
        })
        got = self._run_files(spark, tmp_path, (f1, f2), "t_twa_nat") \
            .collect()
        assert len(got) == 1
        assert got[0].covered_us == 40 * 60 * 1_000_000

    def test_future_endpoint_dewedges(self, spark, tmp_path):
        base = pd.Timestamp("2024-05-01")
        f1 = pd.DataFrame({
            "series_key": ["a", "a"],
            "ts": [base, pd.Timestamp("2090-01-01")],  # clock-skewed
            "value": [1.0, 999.0],
        })
        f2 = pd.DataFrame({
            "series_key": ["a", "a"],
            "ts": [base + pd.Timedelta(minutes=10),
                   base + pd.Timedelta(minutes=30)],
            "value": [5.0, 6.0],
        })
        got = self._run_files(spark, tmp_path, (f1, f2), "t_twa_wedge") \
            .collect()
        # the 2090 endpoint is discarded (over-cap ahead of batch 2) and
        # the state falls back to the pre-poison endpoint at base: the
        # bridge base->minute-10 AND the 10->30 segment both emit —
        # full recovery from a single clock-skew blip
        assert len(got) == 1
        assert got[0].covered_us == 30 * 60 * 1_000_000
        assert got[0].twa_locf == pytest.approx(
            (10 * 1.0 + 20 * 5.0) / 30)

    def test_double_poison_restarts_without_bridge(self, spark, tmp_path):
        base = pd.Timestamp("2024-05-01")
        f1 = pd.DataFrame({
            "series_key": ["a", "a", "a"],
            "ts": [base, pd.Timestamp("2090-01-01"),
                   pd.Timestamp("2091-01-01")],  # over-cap apart: the
            # poison run emits nothing of its own
            "value": [1.0, 999.0, 998.0],
        })
        f2 = pd.DataFrame({
            "series_key": ["a", "a"],
            "ts": [base + pd.Timedelta(minutes=10),
                   base + pd.Timedelta(minutes=30)],
            "value": [5.0, 6.0],
        })
        got = self._run_files(spark, tmp_path, (f1, f2),
                              "t_twa_wedge2").collect()
        # both carried endpoints are poisoned: the pre-poison boundary is
        # lost, the series restarts from batch 2 — only its own segment
        assert len(got) == 1
        assert got[0].covered_us == 20 * 60 * 1_000_000
        assert got[0].twa_locf == pytest.approx(5.0)

    def test_over_cap_gap_is_series_break(self, spark, tmp_path):
        base = pd.Timestamp("2024-05-01")
        f1 = pd.DataFrame({
            "series_key": ["a", "a", "a"],
            "ts": [base, base + pd.Timedelta(minutes=30),
                   base + pd.Timedelta(days=90)],
            "value": [1.0, 2.0, 3.0],
        })
        got = self._run_files(spark, tmp_path, (f1,), "t_twa_break") \
            .collect()
        # only the 30-minute segment: the 90-day gap exceeds the cap
        assert len(got) == 1
        assert got[0].covered_us == 30 * 60 * 1_000_000

    def test_tie_col_deterministic_duplicates(self, spark, tmp_path):
        base = pd.Timestamp("2024-05-01")
        f1 = pd.DataFrame({
            "series_key": ["a", "a", "a", "a"],
            "ts": [base, base + pd.Timedelta(minutes=30),
                   base + pd.Timedelta(minutes=30),
                   base + pd.Timedelta(minutes=60)],
            "value": [1.0, 9.0, 2.0, 0.0],
        })
        f1["tie"] = [0, 1, 2, 3]
        d = tmp_path / "in"
        d.mkdir()
        f1c = f1.copy()
        f1c["ts"] = f1c["ts"].astype("datetime64[us]")
        f1c.to_parquet(d / "b0.parquet", index=False)
        stream = (spark.readStream
                  .schema(SCHEMA + ", tie long")
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        q = (stream_time_weighted(stream, "1h", tie_col="tie",
                                  watermark="2 hours")
             .writeStream.outputMode("append").format("memory")
             .queryName("t_twa_tie").trigger(availableNow=True).start())
        q.awaitTermination()
        got = finalize_time_weighted(
            spark.sql("SELECT * FROM t_twa_tie")).collect()
        # tie order: the minute-30 duplicate with tie=2 opens the second
        # segment (LOCF v=2.0), deterministically; both segments land in
        # the single hour bucket
        assert len(got) == 1
        assert got[0].covered_us == 3600 * 1_000_000
        assert got[0].twa_locf == pytest.approx((30 * 1.0 + 30 * 2.0) / 60)
