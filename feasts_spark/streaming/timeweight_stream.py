"""Streaming twins of operators.timeweight (time-weighted mean and state
occupancy).

A segment closes the moment its RIGHT endpoint arrives (no watermark wait
— unlike a windowed aggregate, the closing event itself is the proof the
segment is complete), so the stream can emit each segment's per-bucket
contribution immediately and exactly once. The contributions are
ADDITIVE partials — (Σ w·v_locf, Σ w·v̄_linear, Σ w) per (key, bucket),
or (Σ w) per (key, bucket, state) — because a bucket keeps receiving
weight from segments that close in later micro-batches;
`operators.timeweight.finalize_time_weighted` (re-exported here) sums
then divides, the same split-emit/finalize contract the top-k stream
uses (ratios, like ranks, are not streaming-safe).

State per key is ONE row: the last sample — the potential left endpoint
of the next segment. The vectorized walk reuses the batch operator's
bucket-split algebra, shared between both twins below.

Input sanitation the batch twin gets for free and a stateful stream must
do explicitly:

  - NULL event times are dropped before anything else (a NaT would
    otherwise poison the carried endpoint as int64-min and blow up the
    bucket expansion);
  - pairs wider than `max_segment_seconds` (default 30 days) are treated
    as series BREAKS: no LOCF carry across them. This bounds the bucket
    expansion per segment AND de-wedges a key whose carried endpoint was
    corrupted by a far-future (clock-skewed) timestamp — when the
    carried endpoint sits more than the cap ahead of the entire next
    batch, the state falls back to the PREVIOUS endpoint (whose over-cap
    pair was never emitted, so it is exactly where emissions stopped):
    the staleness boundary and the bridging segment both recover, and
    nothing double-counts. Only a run of ≥2 consecutive poisoned
    samples loses that boundary; the series then restarts from the
    batch, and stragglers older than the last pre-poison emission could
    re-emit overlapping coverage (residual, documented). NOTE the
    cross-key blast radius Spark imposes regardless: the poisoned event
    advances the GLOBAL event-time watermark, which fires every other
    key's armed TTL timeout — their endpoints are dropped as idle and
    each series restarts cleanly (one bridging segment lost per key, no
    double-count). The batch operator has no cap and no watermark (it
    sees the whole corpus at once and emits the true segments).

Divergences from batch, the price of O(1) state per key:
  - rows at or before the carried endpoint's timestamp are DROPPED (the
    stream cannot re-pair history). Spark does NOT filter the operator's
    input rows by the watermark (applyInPandasWithState hands over
    whatever arrives; the watermark only drives timeouts) — the per-key
    staleness check is the real guard, and a months-late straggler on a
    TTL-forgotten key opens a fresh series rather than being dropped.
    With duplicate timestamps this means the
    FIRST-arriving sample wins across a micro-batch boundary while
    `tie_col` order wins within one — pass a tie column for in-batch
    determinism, and use the batch operator for corpora where duplicate
    timestamps carry meaning. Batch `time_weighted` over the full
    corpus is the backfill path, as everywhere in this package.
  - an idle key is forgotten after `idle_ttl_seconds` of event time, so
    a sample arriving after the TTL opens a fresh series: the segment
    bridging the idle gap is not emitted (batch emits it).
  - gaps longer than `max_segment_seconds` emit no coverage (batch
    emits the full LOCF carry).

Bounded input arriving in order (no duplicate timestamps split across
batches, no over-cap gaps) produces partials whose finalize equals the
batch operator to float-association tolerance (asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feasts_spark.operators.rollup import TIER_SECONDS
from feasts_spark.operators.timeweight import (  # noqa: F401  (re-export)
    finalize_time_weighted,
)

_STATE_SCHEMA_VALUE = (
    "last_ts_us long, last_val double, prev_ts_us long, prev_val double"
)
_STATE_SCHEMA_STATE = (
    "last_ts_us long, last_state string, prev_ts_us long, prev_state string"
)


def _arm(state: GroupState, last_us: int, ttl_s: int) -> None:
    to_ms = last_us // 1000 + ttl_s * 1000
    state.setTimeoutTimestamp(max(to_ms, state.getCurrentWatermarkMs() + 1))


def _clean_sorted(pdfs, ts_col: str, tie_col: str | None) -> pd.DataFrame:
    """Concatenate a micro-batch's chunks, drop NULL event times, sort by
    (ts, tie). Returns an empty frame when nothing survives."""
    parts = [p for p in pdfs if len(p)]
    if not parts:
        return pd.DataFrame()
    batch = pd.concat(parts, ignore_index=True)
    batch = batch[batch[ts_col].notna()]
    if batch.empty:
        return batch
    cols = [ts_col] + ([tie_col] if tie_col else [])
    return batch.sort_values(cols, kind="mergesort")


def _merge_carried(ts, pay, state: GroupState, max_seg_us: int):
    """Prepend the carried endpoint to the batch arrays.

    Returns (ts, pay, rearm_only_us): rearm_only_us is set when every
    batch row is stale (<= carried endpoint) and the caller should just
    re-arm the TTL.

    De-wedge: a carried endpoint more than max_seg_us AHEAD of the whole
    batch is corrupt (clock-skewed future sample). Its over-cap pair was
    never emitted, so emissions truly end at the PREVIOUS endpoint — the
    state carries that too, and recovery restores it as both the
    staleness boundary (rows at or before it cannot re-pair and
    double-count already-emitted coverage) and the bridging left
    endpoint (no segment is lost). Only a RUN of ≥2 consecutive
    poisoned samples loses the real boundary; then the series restarts
    from the batch, with a documented residual overlap risk for
    stragglers older than the last pre-poison emission."""
    if not state.exists:
        return ts, pay, None
    last_us, last_pay, prev_us, prev_pay = state.get
    if last_us - int(ts[-1]) > max_seg_us:
        # poisoned endpoint; fall back to the pre-poison endpoint if it
        # is itself sane, else restart from the batch
        if prev_us is None or prev_us - int(ts[-1]) > max_seg_us:
            return ts, pay, None
        last_us, last_pay = prev_us, prev_pay
    keep = ts > last_us
    ts, pay = ts[keep], pay[keep]
    if ts.size == 0:
        return ts, pay, last_us
    return (np.concatenate(([last_us], ts)),
            np.concatenate(([last_pay], pay)), None)


def _closed_pairs(ts, pay, max_seg_us: int):
    """(t0, t1, p0, p1) for consecutive pairs that form real segments:
    positive width, no wider than the cap (over-cap = series break)."""
    t0, t1 = ts[:-1], ts[1:]
    p0, p1 = pay[:-1], pay[1:]
    ok = (t1 > t0) & (t1 - t0 <= max_seg_us)
    return t0[ok], t1[ok], p0[ok], p1[ok]


def _bucket_pieces(t0, t1, tier_us: int):
    """Split segments across tier buckets: (idx, b, a_us, e_us, w) for
    every positive-width in-bucket piece — the same algebra as the batch
    operator's `_bucketed`, vectorized over numpy. Piece counts are
    bounded by max_segment_seconds / tier."""
    b0, b1 = t0 // tier_us, t1 // tier_us
    counts = (b1 - b0 + 1).astype("int64")
    idx = np.repeat(np.arange(t0.size), counts)
    within = np.arange(idx.size) - np.repeat(
        np.cumsum(counts) - counts, counts)
    b = b0[idx] + within
    a = np.maximum(t0[idx], b * tier_us)
    e = np.minimum(t1[idx], (b + 1) * tier_us)
    w = e - a
    pos = w > 0
    return idx[pos], b[pos], a[pos], e[pos], w[pos]


def stream_time_weighted(
    stream: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str | None = None,
    watermark: str = "10 minutes",
    idle_ttl_seconds: int = 7 * 24 * 3600,
    max_segment_seconds: int = 30 * 24 * 3600,
) -> DataFrame:
    """Append stream of additive time-weight partials per (key, bucket).

    Feed the accumulated output through `finalize_time_weighted` (or
    commit partials to a snapshot table and finalize at query time —
    partials merge by plain SUM, so append-only commits suffice).
    """
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}")
    tier_us = TIER_SECONDS[tier] * 1_000_000
    max_seg_us = max_segment_seconds * 1_000_000
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"series_key {key_type}, bucket_ts timestamp, "
        "w_us long, swv_locf double, swv_linear double"
    )

    def fn(key, pdfs, state: GroupState):
        k = key[0]
        if state.hasTimedOut:
            state.remove()  # idle key: forget the dangling left endpoint
            return
        batch = _clean_sorted(pdfs, ts_col, tie_col)
        if batch.empty:
            return
        ts = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        vals = batch[value_col].to_numpy(dtype="float64")
        ts, vals, rearm_us = _merge_carried(ts, vals, state, max_seg_us)
        if rearm_us is not None:
            _arm(state, rearm_us, idle_ttl_seconds)
            return
        state.update((
            int(ts[-1]), float(vals[-1]),
            int(ts[-2]) if ts.size >= 2 else None,
            float(vals[-2]) if ts.size >= 2 else None,
        ))
        _arm(state, int(ts[-1]), idle_ttl_seconds)
        if ts.size < 2:
            return
        t0, t1, v0, v1 = _closed_pairs(ts, vals, max_seg_us)
        if t0.size == 0:
            return
        idx, b, a_us, e_us, w = _bucket_pieces(t0, t1, tier_us)
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

    cols = [F.col(key_col), F.col(ts_col), F.col(value_col)]
    if tie_col:
        cols.append(F.col(tie_col))
    keyed = stream.select(*cols).withWatermark(ts_col, watermark)
    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA_VALUE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_duration_in_state(
    stream: DataFrame,
    tier: str,
    key_col: str = "series_key",
    ts_col: str = "ts",
    state_col: str = "state",
    tie_col: str | None = None,
    watermark: str = "10 minutes",
    idle_ttl_seconds: int = 7 * 24 * 3600,
    max_segment_seconds: int = 30 * 24 * 3600,
) -> DataFrame:
    """Streaming twin of operators.timeweight.duration_in_state: append
    stream of additive (key, bucket, state, w_us) partials, one emission
    per closed segment-bucket overlap. Partials merge by plain SUM over
    (key, bucket, state); run a `state_top`-style argmax over the summed
    frame for dominance queries. Same state / sanitation / staleness
    contract as :func:`stream_time_weighted`."""
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}")
    from pyspark.sql import types as T
    if not isinstance(stream.schema[state_col].dataType, T.StringType):
        raise ValueError(
            "stream_duration_in_state carries the last state in string "
            f"state storage; {state_col!r} must be a string column "
            "(cast categorical codes first)")
    tier_us = TIER_SECONDS[tier] * 1_000_000
    max_seg_us = max_segment_seconds * 1_000_000
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"series_key {key_type}, bucket_ts timestamp, "
        "state string, w_us long"
    )

    def fn(key, pdfs, state: GroupState):
        k = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        batch = _clean_sorted(pdfs, ts_col, tie_col)
        if batch.empty:
            return
        ts = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        sts = batch[state_col].to_numpy()
        ts, sts, rearm_us = _merge_carried(ts, sts, state, max_seg_us)
        if rearm_us is not None:
            _arm(state, rearm_us, idle_ttl_seconds)
            return
        state.update((
            int(ts[-1]), None if sts[-1] is None else str(sts[-1]),
            int(ts[-2]) if ts.size >= 2 else None,
            (None if sts[-2] is None else str(sts[-2]))
            if ts.size >= 2 else None,
        ))
        _arm(state, int(ts[-1]), idle_ttl_seconds)
        if ts.size < 2:
            return
        t0, t1, s0, _s1 = _closed_pairs(ts, sts, max_seg_us)
        if t0.size == 0:
            return
        idx, b, _a, _e, w = _bucket_pieces(t0, t1, tier_us)
        if w.size == 0:
            return
        part = pd.DataFrame({"b": b, "state": s0[idx], "w_us": w}) \
            .groupby(["b", "state"], as_index=False, dropna=False).sum()
        part["series_key"] = k
        part["bucket_ts"] = pd.to_datetime(part.pop("b") * tier_us,
                                           unit="us")
        yield part[["series_key", "bucket_ts", "state", "w_us"]]

    cols = [F.col(key_col), F.col(ts_col), F.col(state_col)]
    if tie_col:
        cols.append(F.col(tie_col))
    keyed = stream.select(*cols).withWatermark(ts_col, watermark)
    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
