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
    for i, part in enumerate(np.array_split(pdf, n_files)):
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
