"""Streaming feature extraction — the streaming twin of
operators.features.features() (reference features.R / zzz.R surface).

Continuous monitoring wants the feasts feature pack (trend/seasonal
strength, ACF/PACF summaries, spectral entropy, shift/crossing stats,
unit-root tests...) recomputed per series as new rolled-up points arrive,
without rescanning history. This operator keeps, per key, a bounded
trailing window of the last `window_points` points in stream state and
re-emits a feature SNAPSHOT for every key that received data in a
micro-batch:

  - state is two parallel arrays (ts_us, vals) capped at `window_points`
    — memory per key is fixed, so total state is bounded by the active
    key set regardless of stream length;
  - each batch's rows are merged into the buffer (stable sort by event
    time; a re-delivered timestamp REPLACES its old value, so upstream
    rollup re-emits are idempotent), truncated to the trailing window,
    and handed to operators.features.compute_feature_pack — the SAME
    kernel the batch operator runs, so a snapshot equals the batch
    feature row over the identical trailing window by construction
    (asserted in tests);
  - an optional event-time `idle_ttl_seconds` drops the buffer of keys
    silent for that long (watermark-driven timeout), bounding the key
    set for evolving corpora.

Output: (key, window_end, n_points, <pack columns>) per updated key per
micro-batch, append mode. Keys with fewer than `min_points` buffered
points emit nothing yet. The only shuffle keys on the series key — the
same exchange the batch feature pack pays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feasts_spark.operators.features import compute_feature_pack, pack_columns

_STATE_SCHEMA = "ts_us array<long>, vals array<double>"


def _out_schema(select, key_type: "T.DataType") -> "T.StructType":
    # The key keeps the INPUT column's type (string conv ids, long
    # bucket keys, ...) — a hardcoded long would silently cast string
    # keys to NULL and merge every series into one group (ADVICE r03).
    cols = pack_columns(None, select)
    return T.StructType(
        [
            T.StructField("series_key", key_type),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("n_points", T.LongType()),
        ]
        + [T.StructField(c, T.DoubleType()) for c in cols]
    )


def stream_features(
    stream: DataFrame,
    period: int = 24,
    window_points: int = 168,
    min_points: int = 12,
    key_col: str = "series_key",
    ts_col: str = "bucket_ts",
    value_col: str = "val_avg",
    watermark: str = "10 minutes",
    select: tuple[str, ...] | None = None,
    idle_ttl_seconds: int | None = None,
) -> DataFrame:
    """Append stream of per-key feature-pack snapshots over the trailing
    `window_points` points (see module docstring).

    `select` restricts the pack to chosen kernels (feature_set() names),
    shrinking both compute and output schema — the usual monitoring
    deployment runs a handful of cheap kernels at a tight cadence.
    """
    if window_points < max(min_points, 2):
        raise ValueError(
            f"window_points={window_points} must be >= min_points and >= 2"
        )
    cols = pack_columns(None, select)
    key_type = stream.schema[key_col].dataType
    out_schema = _out_schema(select, key_type)
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state: GroupState):
        k = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True)
        new_ts = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        new_vals = batch[value_col].to_numpy(dtype="float64")

        if state.exists:
            old_ts, old_vals = state.get
            ts = np.concatenate([np.asarray(old_ts, dtype="int64"), new_ts])
            vals = np.concatenate(
                [np.asarray(old_vals, dtype="float64"), new_vals]
            )
        else:
            ts, vals = new_ts, new_vals

        # stable sort, then keep the LAST delivery of each timestamp so a
        # re-emitted rollup point replaces rather than duplicates
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]
        keep = np.ones(ts.size, dtype=bool)
        keep[:-1] = ts[1:] != ts[:-1]
        ts, vals = ts[keep], vals[keep]
        if ts.size > window_points:
            ts, vals = ts[-window_points:], vals[-window_points:]

        state.update((ts.tolist(), vals.tolist()))
        if idle_ttl_seconds is not None:
            to_ms = ts[-1] // 1000 + idle_ttl_seconds * 1000
            state.setTimeoutTimestamp(
                max(int(to_ms), state.getCurrentWatermarkMs() + 1)
            )
        if ts.size < min_points:
            return
        feats = compute_feature_pack(vals, period=period, select=select)
        row = {
            "series_key": k,
            "window_end": pd.Timestamp(int(ts[-1]), unit="us"),
            "n_points": int(ts.size),
        }
        for c in cols:
            row[c] = float(feats.get(c, float("nan")))
        yield pd.DataFrame([row])

    keyed = stream.select(
        F.col(key_col).alias("k"),
        F.col(ts_col),
        F.col(value_col),
    ).withWatermark(ts_col, watermark)
    return keyed.groupBy("k").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
