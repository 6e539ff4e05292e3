"""Streaming twin of operators.flow — conversation-flow partials.

A role transition closes the moment the NEXT turn arrives (the closing
turn is the proof — no watermark wait), so the stream emits each
transition's contribution exactly once, as ADDITIVE partials per
(conv_id, edge): n, Σ delta_s, and a fixed-grid latency histogram in the
same format as operators.sketch (clamped floor((x−lo)/width) binning),
so histograms merge by element-wise SUM like every other cascade column.
`finalize_conv_flow` sums the partials and reproduces the batch pack's
schema — mean_s exactly (Σ/Σ), n_convs exactly (partials carry conv_id),
p50/p90/p99 to one histogram-bin resolution (exact percentiles, like
ranks and ratios, are not streaming-safe; the batch operator is the
backfill path, as everywhere in this package).

State per conversation is ONE row — the carried last turn (ts + payload)
plus the pre-poison endpoint, reusing the timeweight twins' sanitation
contract verbatim (_clean_sorted / _merge_carried): NaT drop, staleness
drop of rows at or before the carried endpoint, de-wedge of a
clock-skewed future endpoint, TTL forget of idle conversations.

Divergences from batch conv_flow, the price of O(1) state per key:
  - the stream orders turns by (ts, tie_col), not turn_idx — pass
    tie_col="turn_idx" so same-timestamp turns pair deterministically;
    a corpus where turn order disagrees with timestamp order needs the
    batch operator;
  - a same-timestamp pair SPLIT ACROSS micro-batches drops (the
    staleness guard cannot distinguish it from a re-delivery); within
    one batch zero-gap transitions count, as in batch;
  - gaps wider than max_segment_seconds are series breaks (batch has no
    cap); idle conversations forget their endpoint after the event-time
    TTL, so the bridging transition is not emitted;
  - rows with a NULL role drop at the door (batch surfaces them as
    NULL-keyed pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feasts_spark.streaming.timeweight_stream import (
    _arm,
    _clean_sorted,
    _merge_carried,
)

_SEP = "\x1f"
_STATE_SCHEMA = (
    "last_ts_us long, last_pay string, prev_ts_us long, prev_pay string"
)


def stream_conv_flow(
    stream: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
    tie_col: str | None = "turn_idx",
    lat_lo: float = 0.0,
    lat_hi: float = 3600.0,
    n_bins: int = 256,
    watermark: str = "10 minutes",
    idle_ttl_seconds: int = 7 * 24 * 3600,
    max_segment_seconds: int = 30 * 24 * 3600,
) -> DataFrame:
    """Append stream of additive flow partials.

    Output: conv_id, tag ('pair'|'tool'), k1, k2, n, n_lat (calls that
    carry a latency — an opening tool call has none), sum_s,
    hist (array<long>, the [lat_lo, lat_hi) grid). Merge by SUM /
    element-wise array sum; `finalize_conv_flow` does exactly that.
    """
    max_seg_us = max_segment_seconds * 1_000_000
    width = (lat_hi - lat_lo) / n_bins
    key_type = stream.schema[conv_col].dataType.simpleString()
    out_schema = (
        f"conv_id {key_type}, tag string, k1 string, k2 string, "
        "n long, n_lat long, sum_s double, hist array<long>"
    )

    def _rows(out, conv, tag, k1s, k2s, delta, bins):
        """Group (k1, k2) pairs in numpy and append one partial row per
        observed edge — a handful of groups, so the python loop is over
        edges, never rows."""
        keys = pd.DataFrame({"k1": k1s, "k2": k2s})
        for (k1, k2), idx in keys.groupby(
            ["k1", "k2"], dropna=False, sort=False
        ).indices.items():
            out.append({
                "conv_id": conv,
                "tag": tag,
                "k1": k1,
                "k2": None if k2 is None or k2 != k2 else k2,
                "n": int(len(idx)),
                "n_lat": int(len(idx)),
                "sum_s": float(delta[idx].sum()),
                "hist": np.bincount(
                    bins[idx], minlength=n_bins
                ).astype("int64").tolist(),
            })

    def fn(key, pdfs, state: GroupState):
        conv = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        was_new = not state.exists
        batch = _clean_sorted(pdfs, ts_col, tie_col)
        if batch.empty:
            return
        batch = batch[batch[role_col].notna()]
        if batch.empty:
            return
        ts = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        # tool payload is FLAGGED ("T" + value) so a NULL tool stays
        # distinguishable from an empty-string tool name, which the
        # batch operator counts as a real (k1 = '') group
        tool_flagged = batch[tool_col].map(
            lambda t: "" if pd.isna(t) else "T" + str(t)
        )
        pay = (
            batch[role_col].astype(str) + _SEP + tool_flagged
        ).to_numpy(dtype=object)
        ts, pay, rearm_us = _merge_carried(ts, pay, state, max_seg_us)
        if rearm_us is not None:
            _arm(state, rearm_us, idle_ttl_seconds)
            return
        state.update((
            int(ts[-1]), str(pay[-1]),
            int(ts[-2]) if ts.size >= 2 else None,
            str(pay[-2]) if ts.size >= 2 else None,
        ))
        _arm(state, int(ts[-1]), idle_ttl_seconds)
        out: list[dict] = []
        if was_new:
            # a conversation-opening TOOL turn is a call with no
            # latency: batch tool_usage counts it in n (its NULL delta
            # skips the mean/percentiles), so the stream emits a
            # zero-latency-count partial for it. "Opening" is as far as
            # the stream remembers — a TTL-forgotten conversation's
            # comeback turn also lands here (documented divergence).
            tool0 = str(pay[0]).split(_SEP, 1)[1]
            if tool0.startswith("T"):
                out.append({
                    "conv_id": conv, "tag": "tool", "k1": tool0[1:],
                    "k2": None, "n": 1, "n_lat": 0, "sum_s": 0.0,
                    "hist": [0] * n_bins,
                })
        if ts.size >= 2:
            # consecutive pairs; zero-gap pairs are real transitions
            # (equal timestamps ordered by tie_col), over-cap gaps are
            # series breaks
            ok = (ts[1:] - ts[:-1] <= max_seg_us)
            t0, t1 = ts[:-1][ok], ts[1:][ok]
            p0, p1 = pay[:-1][ok], pay[1:][ok]
            if t0.size:
                delta = (t1 - t0) / 1e6
                bins = np.clip(
                    np.floor((delta - lat_lo) / width).astype("int64"),
                    0, n_bins - 1,
                )
                split0 = pd.Series(p0).str.partition(_SEP)
                split1 = pd.Series(p1).str.partition(_SEP)
                role_from = split0[0].to_numpy(dtype=object)
                role_to = split1[0].to_numpy(dtype=object)
                tool_flag = split1[2]
                _rows(out, conv, "pair", role_from, role_to, delta, bins)
                has_tool = tool_flag.str.startswith("T").to_numpy()
                if has_tool.any():
                    _rows(
                        out, conv, "tool",
                        tool_flag.str[1:].to_numpy(dtype=object)[has_tool],
                        np.full(int(has_tool.sum()), None, dtype=object),
                        delta[has_tool], bins[has_tool],
                    )
        if out:
            yield pd.DataFrame(out)

    cols = [
        F.col(conv_col), F.col(role_col), F.col(tool_col),
        # parquet transcript tables read as TIMESTAMP_NTZ, which
        # withWatermark rejects; sessions run UTC so the cast is a no-op
        # relabel (the engine-wide unix_micros contract)
        F.col(ts_col).cast("timestamp").alias(ts_col),
    ]
    if tie_col:
        cols.append(F.col(tie_col))
    keyed = stream.select(*cols).withWatermark(ts_col, watermark)
    return keyed.groupBy(conv_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def finalize_conv_flow(
    partials: DataFrame,
    lat_lo: float = 0.0,
    lat_hi: float = 3600.0,
    n_bins: int = 256,
) -> DataFrame:
    """Fold accumulated stream partials into the batch pack's schema:
    tag, k1, k2, n, n_convs, share, mean_s, p50_s, p90_s, p99_s.

    n / n_convs / share / mean_s are exact (sums and a distinct count
    over the partial rows); the percentiles are histogram estimates
    accurate to one bin width of the [lat_lo, lat_hi) grid — the
    documented streaming trade. lat_lo/lat_hi/n_bins must match the
    values the stream binned with.
    """
    from feasts_spark.operators.sketch import _merge_arrays, hist_quantile

    merged = (
        partials.withColumn("_v", F.col("hist"))
        .groupBy("tag", "k1", "k2")
        .agg(
            F.sum("n").alias("n"),
            F.sum("n_lat").alias("n_lat"),
            F.count_distinct("conv_id").alias("n_convs"),
            F.sum("sum_s").alias("sum_s"),
            _merge_arrays(n_bins).alias("hist"),
        )
    )
    # mean/percentiles run over the LATENCY-CARRYING calls only (n_lat):
    # a conversation-opening tool call has no gap, and batch avg /
    # percentile skip its NULL delta while still counting it in n
    q = merged.withColumnRenamed("n_lat", "n_points")
    for p, name in ((0.5, "p50_s"), (0.9, "p90_s"), (0.99, "p99_s")):
        q = hist_quantile(q, p, lat_lo, lat_hi, out_col=name)
    share_w = W.partitionBy(
        "tag", F.when(F.col("tag") == "pair", F.col("k1")).otherwise(F.lit(""))
    )
    no_lat = F.col("n_points") == 0
    return q.select(
        "tag", "k1", "k2", "n", "n_convs",
        (F.col("n") / F.sum("n").over(share_w)).alias("share"),
        F.when(no_lat, F.lit(None)).otherwise(
            F.col("sum_s") / F.col("n_points")
        ).alias("mean_s"),
        *[
            F.when(no_lat, F.lit(None).cast("double"))
            .otherwise(F.col(c)).alias(c)
            for c in ("p50_s", "p90_s", "p99_s")
        ],
    )
