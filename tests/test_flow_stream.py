"""stream_conv_flow: finalize(streamed partials) must reproduce the batch
conv_flow pack — exactly for n / n_convs / share / mean_s, to one
histogram bin for the percentiles — with transitions bridging micro-batch
boundaries via the carried last turn."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.flow import conv_flow
from feasts_spark.streaming.flow_stream import (
    finalize_conv_flow,
    stream_conv_flow,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, ts timestamp"
)
BINS = dict(lat_lo=0.0, lat_hi=600.0, n_bins=600)  # 1s resolution


def _corpus():
    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-05-01")
    rows = []
    roles = ["user", "assistant", "tool"]
    tools = ["search", "calc", "fetch"]
    for c in range(8):
        t = 0.0
        for i in range(int(rng.integers(12, 40))):
            role = roles[int(rng.integers(0, 3))] if i else "user"
            tool = tools[int(rng.integers(0, 3))] if role == "tool" else None
            rows.append((f"c{c}", i, role, tool,
                         base + pd.Timedelta(seconds=t)))
            t += float(rng.uniform(1, 240))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf.sort_values(["ts", "conv_id"], ignore_index=True)


def _edge_deltas(pdf):
    """Per-edge inter-turn gaps straight from the corpus — the ground
    truth both the batch pack and the stream twin summarize."""
    out: dict = {}
    for _, conv in pdf.sort_values(["conv_id", "turn_idx"]).groupby(
        "conv_id"
    ):
        ts = conv["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        roles = conv["role"].to_numpy(dtype=object)
        tools = conv["tool"].to_numpy(dtype=object)
        d = (ts[1:] - ts[:-1]) / 1e6
        for i in range(len(d)):
            out.setdefault(("pair", roles[i], roles[i + 1]), []).append(d[i])
            if tools[i + 1] is not None:
                out.setdefault(("tool", tools[i + 1], None), []).append(d[i])
    return out


def _run(spark, tmp_path, pdf, n_files=6, name="t_flow_stream"):
    d = tmp_path / "in"
    d.mkdir()
    # an all-None chunk would otherwise infer a non-string parquet type
    pdf = pdf.assign(tool=pdf["tool"].astype("string"),
                     role=pdf["role"].astype("string"))
    for i, ix in enumerate(np.array_split(np.arange(len(pdf)), n_files)):
        pdf.iloc[ix].to_parquet(d / f"b{i:02d}.parquet", index=False)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (stream_conv_flow(stream, watermark="10 minutes", **BINS)
         .writeStream.outputMode("append").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


class TestStreamConvFlow:
    def test_finalize_matches_batch(self, spark, tmp_path):
        pdf = _corpus()
        parts = _run(spark, tmp_path, pdf)
        got = {
            (r["tag"], r["k1"], r["k2"]): r.asDict()
            for r in finalize_conv_flow(
                parts, BINS["lat_lo"], BINS["lat_hi"], BINS["n_bins"]
            ).collect()
        }
        exp = {
            (r["tag"], r["k1"], r["k2"]): r.asDict()
            for r in conv_flow(spark.createDataFrame(pdf)).collect()
        }
        assert set(got) == set(exp)
        bin_w = (BINS["lat_hi"] - BINS["lat_lo"]) / BINS["n_bins"]
        deltas = _edge_deltas(pdf)
        for k, e in exp.items():
            g = got[k]
            # exact columns
            assert g["n"] == e["n"], k
            assert g["n_convs"] == e["n_convs"], k
            assert g["share"] == pytest.approx(e["share"], abs=1e-12), k
            assert g["mean_s"] == pytest.approx(e["mean_s"], rel=1e-9), k
            # histogram percentiles estimate the ceil(q*n) ORDER STATISTIC
            # to one bin (hist_quantile's contract — batch `percentile`
            # interpolates BETWEEN order statistics, which no histogram
            # resolution can bound)
            xs = np.sort(deltas[k])
            for q, c in ((0.5, "p50_s"), (0.9, "p90_s"), (0.99, "p99_s")):
                target = xs[int(np.ceil(q * len(xs))) - 1]
                assert abs(g[c] - target) <= bin_w + 1e-9, (
                    k, c, g[c], target)

    def test_transitions_bridge_batch_boundaries(self, spark, tmp_path):
        # one conversation, one turn per micro-batch: every transition
        # pairs a carried endpoint with a fresh arrival
        base = pd.Timestamp("2024-05-01")
        pdf = pd.DataFrame({
            "conv_id": ["c"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "role": ["user", "assistant", "tool", "assistant"],
            "tool": [None, None, "calc", None],
            "ts": [base + pd.Timedelta(seconds=s) for s in (0, 10, 25, 27)],
        })
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        parts = _run(spark, tmp_path, pdf, n_files=4, name="t_flow_bridge")
        out = {
            (r["tag"], r["k1"], r["k2"]): r
            for r in finalize_conv_flow(
                parts, BINS["lat_lo"], BINS["lat_hi"], BINS["n_bins"]
            ).collect()
        }
        assert out[("pair", "user", "assistant")]["n"] == 1
        assert out[("pair", "assistant", "tool")]["n"] == 1
        assert out[("pair", "tool", "assistant")]["n"] == 1
        assert out[("tool", "calc", None)]["n"] == 1
        assert out[("tool", "calc", None)]["mean_s"] == pytest.approx(15.0)

    def test_opening_tool_turn_counts_without_latency(self, spark,
                                                      tmp_path):
        # batch counts a conversation-opening tool call in n with NULL
        # latency stats; the stream's opener partial must reproduce that
        base = pd.Timestamp("2024-05-01")
        pdf = pd.DataFrame({
            "conv_id": ["c", "c"],
            "turn_idx": [0, 1],
            "role": ["tool", "assistant"],
            "tool": ["boot", None],
            "ts": [base, base + pd.Timedelta(seconds=5)],
        })
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        parts = _run(spark, tmp_path, pdf, n_files=2, name="t_flow_open")
        out = {
            (r["tag"], r["k1"], r["k2"]): r
            for r in finalize_conv_flow(
                parts, BINS["lat_lo"], BINS["lat_hi"], BINS["n_bins"]
            ).collect()
        }
        boot = out[("tool", "boot", None)]
        assert boot["n"] == 1 and boot["mean_s"] is None
        assert boot["p50_s"] is None
        assert out[("pair", "tool", "assistant")]["n"] == 1

    def test_null_roles_drop_at_the_door(self, spark, tmp_path):
        base = pd.Timestamp("2024-05-01")
        pdf = pd.DataFrame({
            "conv_id": ["c"] * 3,
            "turn_idx": [0, 1, 2],
            "role": ["user", None, "assistant"],
            "tool": [None, None, None],
            "ts": [base + pd.Timedelta(seconds=s) for s in (0, 5, 10)],
        })
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        parts = _run(spark, tmp_path, pdf, n_files=1, name="t_flow_null")
        out = finalize_conv_flow(
            parts, BINS["lat_lo"], BINS["lat_hi"], BINS["n_bins"]
        ).collect()
        # the NULL-role turn vanishes: user -> assistant over 10s
        assert len(out) == 1
        r = out[0]
        assert (r["k1"], r["k2"], r["n"]) == ("user", "assistant", 1)
        assert r["mean_s"] == pytest.approx(10.0)


class TestSinkComposition:
    def test_partials_through_snapshot_sink_finalize_equals_batch(
            self, spark, tmp_path):
        """The deployment shape: stream partials commit append-only into
        a snapshot table (exactly-once batch ids) and finalize runs at
        query time over table.read() — equal to batch for the exact
        columns."""
        from feasts_spark.sources.snapshots import SnapshotTable
        from feasts_spark.streaming.snapshot_sink import (
            snapshot_batch_writer,
        )

        pdf = _corpus()
        d = tmp_path / "in"
        d.mkdir()
        pdf2 = pdf.assign(tool=pdf["tool"].astype("string"))
        for i, ix in enumerate(np.array_split(np.arange(len(pdf2)), 5)):
            pdf2.iloc[ix].to_parquet(d / f"b{i}.parquet", index=False)
        table = SnapshotTable(spark, str(tmp_path), "flow_partials")
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        q = (stream_conv_flow(stream, watermark="10 minutes", **BINS)
             .writeStream
             .foreachBatch(snapshot_batch_writer(table, "flow"))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        assert all(h["operation"] == "append" for h in table.history())

        got = {
            (r["tag"], r["k1"], r["k2"]): r.asDict()
            for r in finalize_conv_flow(
                table.read(), BINS["lat_lo"], BINS["lat_hi"],
                BINS["n_bins"],
            ).collect()
        }
        exp = {
            (r["tag"], r["k1"], r["k2"]): r.asDict()
            for r in conv_flow(spark.createDataFrame(pdf)).collect()
        }
        assert set(got) == set(exp)
        for k, e in exp.items():
            g = got[k]
            assert (g["n"], g["n_convs"]) == (e["n"], e["n_convs"]), k
            assert g["share"] == pytest.approx(e["share"], abs=1e-12), k
            assert g["mean_s"] == pytest.approx(e["mean_s"], rel=1e-9), k
