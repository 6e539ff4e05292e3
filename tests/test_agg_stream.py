"""Streaming top-k counts / distinct counts == their batch twins."""

import pandas as pd

SENTINEL_TS = pd.Timestamp("2024-07-30 00:00:00")


def _write_batches(tmp_path, pdf, name):
    d = tmp_path / name
    d.mkdir()
    pdf.assign(ts=pdf["ts"].astype("datetime64[us]")).to_parquet(
        d / "b0.parquet", index=False
    )
    sentinel = pdf.iloc[:1].copy()
    sentinel["ts"] = SENTINEL_TS
    sentinel.assign(ts=sentinel["ts"].astype("datetime64[us]")).to_parquet(
        d / "b1.parquet", index=False
    )
    return d


def _events(spark):
    base = pd.Timestamp("2024-06-01 00:00:00")
    rows = []
    # known per-hour item counts, incl. a tie (b vs c in hour 0 of key k1)
    for h, key, item, n in [
        (0, "k1", "a", 5), (0, "k1", "b", 3), (0, "k1", "c", 3),
        (1, "k1", "b", 4), (1, "k1", "a", 1),
        (0, "k2", "c", 2), (2, "k2", "a", 2), (2, "k2", "c", 1),
    ]:
        for i in range(n):
            rows.append((key, item, base + pd.Timedelta(hours=h, minutes=i)))
    return pd.DataFrame(rows, columns=["k", "item", "ts"])


def test_stream_topk_counts_match_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from feasts_spark.operators.topk import topk_by_group
    from feasts_spark.streaming.agg_stream import (
        finalize_topk, stream_item_counts,
    )

    pdf = _events(spark)
    d = _write_batches(tmp_path, pdf, "topk_in")
    stream = (
        spark.readStream.schema("k string, item string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_item_counts(stream, "1h", key_col="k", ts_col="ts",
                           item_col="item", watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_topk_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_counts = spark.sql(
        "SELECT * FROM t_topk_counts WHERE bucket_ts < '2024-07-01'"
    )
    batch = spark.createDataFrame(pdf).select(
        "k", "item", F.date_trunc("hour", "ts").alias("bucket_ts")
    )
    want_counts = (
        batch.groupBy(
            F.col("k").alias("series_key"), "bucket_ts", "item"
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = sorted(map(tuple, got_counts.collect()))
    b = sorted(map(tuple, want_counts.select(*got_counts.columns).collect()))
    assert a == b and len(a) == 8

    # ranking the closed rows == the batch top-k operator (ties -> item asc)
    got_top = sorted(
        map(tuple, finalize_topk(got_counts, 2)
            .select("series_key", "bucket_ts", "item", "rnk").collect())
    )
    want_top = sorted(
        map(tuple, topk_by_group(
            batch.withColumnRenamed("k", "series_key"), 2,
            ["series_key", "bucket_ts"], "item",
        ).select("series_key", "bucket_ts", "item", "rnk").collect())
    )
    assert got_top == want_top
    # the hour-0 tie resolves to 'b' (item asc) in both engines
    tie = [t for t in got_top if t[0] == "k1" and t[1].hour == 0 and t[3] == 2]
    assert tie[0][2] == "b"


def test_stream_distinct_counts_match_batch(spark, tmp_path):
    from feasts_spark.operators.distinct import distinct_rollup
    from feasts_spark.streaming.agg_stream import stream_distinct_counts

    pdf = _events(spark).rename(columns={"item": "uid"})
    d = _write_batches(tmp_path, pdf, "distinct_in")
    stream = (
        spark.readStream.schema("k string, uid string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_distinct_counts(stream, "1h", ts_col="ts", item_col="uid",
                               watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_distinct_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.bucket_ts: r.n_distinct
        for r in spark.sql(
            "SELECT * FROM t_distinct_counts WHERE bucket_ts < '2024-07-01'"
        ).collect()
    }
    want = {
        r.bucket_ts: r.n_distinct
        for r in distinct_rollup(
            spark.createDataFrame(pdf), "1h", "uid"
        ).collect()
    }
    assert got == want and len(got) == 3
