"""Streaming twin of operators.timeweight.time_weighted.

A segment closes the moment its RIGHT endpoint arrives (no watermark wait
— unlike a windowed aggregate, the closing event itself is the proof the
segment is complete), so the stream can emit each segment's per-bucket
contribution immediately and exactly once. The contributions are
ADDITIVE partials — (Σ w·v_locf, Σ w·v̄_linear, Σ w) per (key, bucket) —
because a bucket can keep receiving weight from segments that close in
later micro-batches; `finalize_time_weighted` turns accumulated partials
into the twa_locf / twa_linear / covered_us frame, the same
split-emit/finalize contract the top-k stream uses (rank is not
streaming-safe; neither is a ratio).

State per key is ONE row: the last sample (ts, value) — the potential
left endpoint of the next segment. The vectorized pandas walk mirrors
the batch operator exactly: consecutive pairs form segments, integer
bucket arithmetic splits them across tier buckets, zero-width pairs
(duplicate timestamps) carry no weight.

Divergences from batch, the price of O(1) state per key:
  - rows at or before the carried last sample's timestamp are DROPPED
    (the stream cannot re-pair history); beyond-watermark stragglers
    never reach the operator at all. Batch `time_weighted` over the
    full corpus is the backfill path, as everywhere in this package.
  - an idle key is forgotten after `idle_ttl_seconds` of event time, so
    a sample arriving after the TTL opens a fresh series: the segment
    bridging the idle gap is not emitted (batch emits it).

Bounded input arriving in order produces partials whose finalize equals
the batch operator to float-association tolerance (asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feasts_spark.operators.rollup import TIER_SECONDS

_STATE_SCHEMA = "last_ts_us long, last_val double"


def _out_schema(key_type) -> str:
    from pyspark.sql import types as T

    return (
        f"series_key {key_type.simpleString()}, bucket_ts timestamp, "
        "w_us long, swv_locf double, swv_linear double"
    )


def stream_time_weighted(
    stream: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
    idle_ttl_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Append stream of additive time-weight partials per (key, bucket).

    Feed the accumulated output through :func:`finalize_time_weighted`
    (or commit partials to a snapshot table and finalize at query time —
    partials merge by plain SUM, so `rollup_merge`-style re-aggregation
    applies).
    """
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}")
    tier_us = TIER_SECONDS[tier] * 1_000_000
    key_type = stream.schema[key_col].dataType
    out_schema = _out_schema(key_type)

    def fn(key, pdfs, state: GroupState):
        k = key[0]
        if state.hasTimedOut:
            state.remove()  # idle key: forget the dangling left endpoint
            return

        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True)
        batch = batch.sort_values(ts_col, kind="mergesort")
        ts = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        vals = batch[value_col].to_numpy(dtype="float64")

        if state.exists:
            last_us, last_val = state.get
            keep = ts > last_us  # cannot re-pair history; drop stale rows
            ts, vals = ts[keep], vals[keep]
            if ts.size == 0:
                # nothing new: re-arm the TTL and keep the endpoint
                _arm(state, last_us, idle_ttl_seconds)
                return
            ts = np.concatenate(([last_us], ts))
            vals = np.concatenate(([last_val], vals))

        state.update((int(ts[-1]), float(vals[-1])))
        _arm(state, int(ts[-1]), idle_ttl_seconds)
        if ts.size < 2:
            return

        t0, t1 = ts[:-1], ts[1:]
        v0, v1 = vals[:-1], vals[1:]
        ok = t1 > t0  # zero-width pairs (duplicate ts) carry no weight
        t0, t1, v0, v1 = t0[ok], t1[ok], v0[ok], v1[ok]
        if t0.size == 0:
            return

        # vectorized bucket split: same algebra as the batch operator
        b0, b1 = t0 // tier_us, t1 // tier_us
        counts = (b1 - b0 + 1).astype("int64")
        idx = np.repeat(np.arange(t0.size), counts)
        within = np.arange(idx.size) - np.repeat(
            np.cumsum(counts) - counts, counts)
        b = b0[idx] + within
        a_us = np.maximum(t0[idx], b * tier_us)
        e_us = np.minimum(t1[idx], (b + 1) * tier_us)
        w = e_us - a_us
        pos = w > 0
        idx, b, a_us, e_us, w = idx[pos], b[pos], a_us[pos], e_us[pos], w[pos]
        if w.size == 0:
            return
        slope = (v1[idx] - v0[idx]) / (t1[idx] - t0[idx])
        va = v0[idx] + slope * (a_us - t0[idx])
        vb = v0[idx] + slope * (e_us - t0[idx])
        part = pd.DataFrame({
            "b": b,
            "w_us": w,
            "swv_locf": w * v0[idx],
            "swv_linear": w * (va + vb) / 2.0,
        }).groupby("b", as_index=False).sum()
        part["series_key"] = k
        part["bucket_ts"] = pd.to_datetime(part.pop("b") * tier_us,
                                           unit="us")
        yield part[["series_key", "bucket_ts", "w_us",
                    "swv_locf", "swv_linear"]]

    def _arm(state: GroupState, last_us: int, ttl_s: int) -> None:
        to_ms = last_us // 1000 + ttl_s * 1000
        state.setTimeoutTimestamp(
            max(to_ms, state.getCurrentWatermarkMs() + 1))

    keyed = stream.select(
        F.col(key_col), F.col(ts_col), F.col(value_col)
    ).withWatermark(ts_col, watermark)
    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_duration_in_state(
    stream: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "ts",
    state_col: str = "state",
    watermark: str = "10 minutes",
    idle_ttl_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Streaming twin of operators.timeweight.duration_in_state: append
    stream of additive (key, bucket, state, w_us) partials, one emission
    per closed segment-bucket overlap. Partials merge by plain SUM over
    (key, bucket, state); run `state_top`-style argmax over the summed
    frame for dominance queries. Same state/staleness contract as
    :func:`stream_time_weighted` (one carried sample per key)."""
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}")
    from pyspark.sql import types as T
    if not isinstance(stream.schema[state_col].dataType, T.StringType):
        raise ValueError(
            "stream_duration_in_state carries the last state in string "
            f"state storage; {state_col!r} must be a string column "
            "(cast categorical codes first)")
    tier_us = TIER_SECONDS[tier] * 1_000_000
    key_type = stream.schema[key_col].dataType
    out_schema = (
        f"series_key {key_type.simpleString()}, bucket_ts timestamp, "
        "state string, w_us long"
    )

    def fn(key, pdfs, state: GroupState):
        k = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True)
        batch = batch.sort_values(ts_col, kind="mergesort")
        ts = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        sts = batch[state_col].to_numpy()

        if state.exists:
            last_us, last_state = state.get
            keep = ts > last_us
            ts, sts = ts[keep], sts[keep]
            if ts.size == 0:
                _arm(state, last_us)
                return
            ts = np.concatenate(([last_us], ts))
            sts = np.concatenate(([last_state], sts))

        state.update((int(ts[-1]), None if sts[-1] is None
                      else str(sts[-1])))
        _arm(state, int(ts[-1]))
        if ts.size < 2:
            return
        t0, t1, s0 = ts[:-1], ts[1:], sts[:-1]
        ok = t1 > t0
        t0, t1, s0 = t0[ok], t1[ok], s0[ok]
        if t0.size == 0:
            return
        b0, b1 = t0 // tier_us, t1 // tier_us
        counts = (b1 - b0 + 1).astype("int64")
        idx = np.repeat(np.arange(t0.size), counts)
        within = np.arange(idx.size) - np.repeat(
            np.cumsum(counts) - counts, counts)
        b = b0[idx] + within
        w = (np.minimum(t1[idx], (b + 1) * tier_us)
             - np.maximum(t0[idx], b * tier_us))
        pos = w > 0
        idx, b, w = idx[pos], b[pos], w[pos]
        if w.size == 0:
            return
        part = pd.DataFrame({"b": b, "state": s0[idx], "w_us": w}) \
            .groupby(["b", "state"], as_index=False, dropna=False).sum()
        part["series_key"] = k
        part["bucket_ts"] = pd.to_datetime(part.pop("b") * tier_us,
                                           unit="us")
        yield part[["series_key", "bucket_ts", "state", "w_us"]]

    def _arm(st: GroupState, last_us: int) -> None:
        to_ms = last_us // 1000 + idle_ttl_seconds * 1000
        st.setTimeoutTimestamp(max(to_ms, st.getCurrentWatermarkMs() + 1))

    keyed = stream.select(
        F.col(key_col), F.col(ts_col), F.col(state_col)
    ).withWatermark(ts_col, watermark)
    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="last_ts_us long, last_state string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def finalize_time_weighted(partials: DataFrame) -> DataFrame:
    """Accumulated micro-batch partials -> the batch operator's output
    frame (twa_locf, twa_linear, covered_us per key and bucket).
    Partials are additive, so this is one SUM aggregate followed by the
    batch finalizer — safe to run over any union of micro-batch
    emissions, including after a snapshot-table merge."""
    from feasts_spark.operators.timeweight import (
        finalize_time_weighted as _fin,
    )

    summed = partials.groupBy("series_key", "bucket_ts").agg(
        F.sum("swv_locf").alias("swv_locf"),
        F.sum("swv_linear").alias("swv_linear"),
        F.sum("w_us").alias("w_us"),
    )
    return _fin(summed)
