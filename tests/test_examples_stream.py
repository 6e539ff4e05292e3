"""Streaming SFT-context assembly (stream_conversation_windows): in-order
streams must emit rows IDENTICAL to the batch conversation_windows
operator; re-delivery must not re-emit; the buffer must bound state."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.examples import conversation_windows
from feasts_spark.streaming.examples_stream import (
    stream_conversation_windows,
)

BASE = pd.Timestamp("2024-03-01")

_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, ts timestamp"
)


def _turns_pdf(conv, n, start=0):
    return pd.DataFrame({
        "conv_id": conv,
        "turn_idx": range(start, start + n),
        "role": ["user" if i % 2 == 0 else "assistant"
                 for i in range(start, start + n)],
        "text": [f"{conv}-t{i}" for i in range(start, start + n)],
        "ts": [BASE + pd.Timedelta(minutes=i)
               for i in range(start, start + n)],
    })


def _write_batches(tmp_path, batches, name):
    d = tmp_path / name
    d.mkdir()
    for i, b in enumerate(batches):
        b.assign(
            ts=b["ts"].astype("datetime64[us]"),
            turn_idx=b["turn_idx"].astype("int32"),
        ).to_parquet(d / f"b{i}.parquet", index=False)
    return d


def _run(spark, d, qname, **kw):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_conversation_windows(stream, **kw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {qname}")


class TestStreamConversationWindows:
    def test_in_order_stream_equals_batch(self, spark, tmp_path):
        full = pd.concat(
            [_turns_pdf("c1", 12), _turns_pdf("c2", 7)], ignore_index=True)
        batches = [
            full[full.turn_idx < 4],
            full[(full.turn_idx >= 4) & (full.turn_idx < 9)],
            full[full.turn_idx >= 9],
        ]
        d = _write_batches(tmp_path, batches, "cw_in")
        got = _run(spark, d, "t_cw_stream", k=3)
        batch = conversation_windows(
            spark.createDataFrame(full, _SCHEMA).drop("ts"), k=3)
        g = sorted(map(tuple, got.collect()))
        b = sorted(map(tuple, batch.collect()))
        assert g == b
        assert len(g) == 19

    def test_redelivery_does_not_reemit(self, spark, tmp_path):
        one = _turns_pdf("c1", 5)
        d = _write_batches(tmp_path, [one, one.iloc[1:3]], "cw_redeliver")
        got = _run(spark, d, "t_cw_redeliver", k=2)
        assert got.count() == 5
        assert got.select("turn_idx").distinct().count() == 5

    def test_buffer_bound_degrades_not_crashes(self, spark, tmp_path):
        """A turn arriving far behind a long conversation still emits,
        with a context built from whatever remains buffered."""
        big = _turns_pdf("c1", 30)
        late = _turns_pdf("c1", 1, start=0).assign(
            turn_idx=[-1], text=["very-late"],
            ts=[BASE + pd.Timedelta(minutes=40)])
        d = _write_batches(tmp_path, [big, late], "cw_late")
        got = _run(spark, d, "t_cw_late", k=3, buffer_turns=8).toPandas()
        assert len(got) == 31
        row = got[got.turn_idx == -1].iloc[0]
        # its predecessors were evicted: context is the turn alone
        assert row["n_ctx"] == 1 and row["ctx"].endswith("very-late")

    def test_validation(self, spark):
        df = spark.createDataFrame([], _SCHEMA)
        with pytest.raises(ValueError, match="positive"):
            stream_conversation_windows(df, k=0)
        with pytest.raises(ValueError, match="buffer_turns"):
            stream_conversation_windows(df, k=8, buffer_turns=4)
