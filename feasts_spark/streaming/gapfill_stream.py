"""Stateful streaming gap-fill (LOCF) — applyInPandasWithState.

The batch operator (operators.gapfill.gapfill_locf) joins a dense grid and
window-fills; its streaming twin cannot see the whole series, so it keeps
one tiny state row per series — (last bucket, last value) — and on every
arriving point vectorized-emits the missing grid buckets since the last
one, each carrying the last observation forward. Union of all micro-batch
outputs == the batch gap-fill of the union of inputs (asserted in
tests/test_streaming.py with a 2-micro-batch split).

State size is O(#series), not O(points) — the shape that survives 10^12
turns. Inside the UDF everything is numpy (np.repeat/cumsum expansion);
no per-row python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _expand_gaps(ts_us: np.ndarray, vals: np.ndarray, step: int,
                 last_us, last_val):
    """Vectorized LOCF expansion: for consecutive observed buckets, emit
    every missing grid bucket in between with the prior value."""
    if last_us is not None:
        ts_ext = np.concatenate(([last_us], ts_us))
        val_ext = np.concatenate(([last_val], vals))
    else:
        ts_ext, val_ext = ts_us, vals
    if ts_ext.size < 2:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    counts = np.maximum(np.diff(ts_ext) // step - 1, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    seg = np.repeat(np.arange(counts.size), counts)
    intra = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    gap_ts = ts_ext[:-1][seg] + (intra + 1) * step
    gap_val = val_ext[:-1][seg]
    return gap_ts, gap_val


def stream_gapfill_locf(
    stream: DataFrame,
    tier: str,
    key_col: str = "series_key",
    bucket_col: str = "bucket_ts",
    value_col: str = "val_avg",
) -> DataFrame:
    """(key, bucket, value) stream -> append stream of the dense filled grid.

    Assumes per-key bucket order within/across micro-batches (rollup output
    with a watermark upstream guarantees this; out-of-order late buckets
    should be closed by the upstream watermark before they reach gap-fill).
    """
    step = _TIER_US[tier]

    def fn(key, pdfs, state: GroupState):
        last_us, last_val = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(bucket_col, kind="mergesort")
            ts_us = (pdf[bucket_col].astype("int64") // 1000).to_numpy()
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            gap_ts, gap_val = _expand_gaps(ts_us, vals, step, last_us, last_val)
            out.append(pd.DataFrame({
                "bucket_us": np.concatenate([ts_us, gap_ts]),
                "value": np.concatenate([vals, gap_val]),
                "is_gap": np.concatenate(
                    [np.zeros(ts_us.size, bool), np.ones(gap_ts.size, bool)]
                ),
            }))
            last_us, last_val = int(ts_us[-1]), float(vals[-1])
        if last_us is not None:
            state.update((last_us, last_val))
        if not out:
            return
        res = pd.concat(out, ignore_index=True).sort_values("bucket_us")
        res.insert(0, key_col, key[0])
        res["bucket_ts"] = pd.to_datetime(res.pop("bucket_us") * 1000)
        yield res[[key_col, "bucket_ts", "value", "is_gap"]]

    key_type = stream.schema[key_col].dataType.simpleString()
    return (
        stream.select(key_col, bucket_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=(
                f"{key_col} {key_type}, bucket_ts timestamp, "
                "value double, is_gap boolean"
            ),
            stateStructType="last_us long, last_val double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
