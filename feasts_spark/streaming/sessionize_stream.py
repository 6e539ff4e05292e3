"""Streaming gap-based sessionization — the streaming twin of
operators.sessionize.session_stats.

A session closes when a key sees no event for `gap_seconds` of EVENT time.
In a stream that close can only be declared once the watermark has passed
last_ts + gap, so the operator is applyInPandasWithState with an
event-time timeout:

  - each micro-batch's rows for a key are merged with the key's open
    session (carried in state), the gap walk is vectorized (diff ->
    boundary flags -> segment aggregation in pandas, no per-row Python),
    every CLOSED session is emitted immediately, and the trailing open
    session goes back into state;
  - the state row re-arms an event-time timeout at last_ts + gap; when
    the watermark crosses it with no new data the open session is
    emitted and the state reduced to a COUNTER-ONLY record (n_events=0)
    holding the key's next session_id, so a later burst for the key
    continues the 0-based id sequence instead of restarting at 0 and
    colliding with already-emitted (key, session_id) rows;
  - counter-only records carry their own event-time TTL
    (`counter_ttl_seconds`, default 100x the gap) after which the key is
    forgotten entirely — state stays bounded by the active-key set, at
    the documented cost that a key silent for longer than the TTL
    restarts its ids at 0 (exactly the batch semantics of re-running on
    a fresh corpus).

Output schema and session semantics (strict gap comparison, 0-based
session_id per key in time order, duration in whole epoch seconds) match
the batch operator exactly for in-order streams and for in-watermark late
events belonging to the open session (merge bounds are min/max-clamped) —
asserted stream==batch in tests. Known divergence, the price of O(1)
aggregate state per key: a late event EARLIER than the open session's
start - gap merges into the open session instead of forming its own
earlier session (the aggregate cannot re-partition history); run the
batch operator for backfills older than that. The only shuffle keys on
the session key, same as the batch window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = (
    "session_start_us long, last_ts_us long, n_events long, "
    "val_sum double, next_session_id long"
)
_OUT_SCHEMA = (
    "series_key long, session_id long, n_events long, "
    "session_start timestamp, session_end timestamp, duration_s long, "
    "val_sum double"
)


def stream_sessionize(
    stream: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
    counter_ttl_seconds: int | None = None,
) -> DataFrame:
    """Append stream of CLOSED sessions per key.

    A session closes when the next event's gap is strictly greater than
    `gap_seconds` (same strict comparison as the batch operator) or when
    the event-time watermark passes last_ts + gap_seconds with no new
    event for the key. After a timeout close the key's session counter is
    retained for `counter_ttl_seconds` (default 100 * gap_seconds) so the
    next session continues the id sequence; see module docstring.
    """
    gap_us = gap_seconds * 1_000_000
    ttl_s = (
        100 * gap_seconds if counter_ttl_seconds is None
        else int(counter_ttl_seconds)
    )

    def _emit(key, sid, start_us, end_us, n, vsum):
        return {
            "series_key": key,
            "session_id": sid,
            "n_events": n,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(end_us, unit="us"),
            # batch: max(floor(epoch)) - min(floor(epoch)) in seconds
            "duration_s": end_us // 1_000_000 - start_us // 1_000_000,
            "val_sum": vsum,
        }

    def fn(key, pdfs, state: GroupState):
        k = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, vsum, sid = state.get
            if n == 0:
                # counter-only record outlived its TTL: forget the key
                state.remove()
                return
            # close the open session but RETAIN the id counter (n=0 marks
            # "no open session") so a later burst continues the sequence;
            # the retention record expires counter_ttl after the close
            state.update((0, last_us, 0, 0.0, sid + 1))
            ttl_ms = last_us // 1000 + (gap_seconds + ttl_s) * 1000
            state.setTimeoutTimestamp(
                max(ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
            yield pd.DataFrame([_emit(k, sid, start_us, last_us, n, vsum)])
            return

        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True)
        batch = batch.sort_values(ts_col, kind="mergesort")
        ts_us = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        vals = batch[value_col].to_numpy(dtype="float64")

        if state.exists:
            start_us, last_us, n, vsum, sid = state.get
            if n == 0:
                # counter-only record: no open session to merge, but the
                # id sequence continues from the retained counter
                start_us, last_us, vsum = None, None, 0.0
        else:
            start_us, last_us, n, vsum, sid = None, None, 0, 0.0, 0

        # vectorized gap walk: a row opens a new segment iff its gap to the
        # previous event (carried open session included) exceeds the gap
        prev = pd.Series(ts_us).shift(1)
        if last_us is not None:
            prev.iloc[0] = last_us
        is_new = (ts_us - prev.to_numpy()) > gap_us
        if last_us is None:
            is_new[0] = True
        seg = is_new.cumsum()  # segment 0 = continuation of the open session
        g = pd.DataFrame({"seg": seg, "ts": ts_us, "v": vals}).groupby("seg")
        agg = g.agg(
            first_ts=("ts", "min"), last_ts=("ts", "max"),
            cnt=("ts", "size"), vs=("v", "sum"),
        ).sort_index()

        out = []
        if last_us is not None and is_new[0]:
            # the first event of this batch opens a NEW segment, so the
            # carried open session closes here: emit it and advance sid —
            # otherwise it would be silently dropped (cumsum starts at
            # segment 1, the Index==0 merge branch never fires) and its
            # session_id reused by the new session
            out.append(_emit(k, sid, start_us, last_us, n, vsum))
            sid += 1
            start_us, last_us, n, vsum = None, None, 0, 0.0
        segs = list(agg.itertuples())
        for i, row in enumerate(segs):
            if row.Index == 0 and last_us is not None:
                # merge into the carried open session. Clamp with min/max:
                # an in-watermark LATE event (ts <= carried last) must not
                # regress the session end / re-arm the close timer early —
                # the aggregates are additive, the bounds are not.
                # Limitation (bounded-state tradeoff, see docstring): late
                # data predating start - gap also lands here; aggregate
                # state cannot re-partition history into a separate
                # earlier session the way the batch operator would.
                cur = (min(start_us, int(row.first_ts)),
                       max(last_us, int(row.last_ts)), n + int(row.cnt),
                       vsum + float(row.vs), sid)
            else:
                cur = (int(row.first_ts), int(row.last_ts), int(row.cnt),
                       float(row.vs), sid)
            if i < len(segs) - 1:
                out.append(_emit(k, cur[4], cur[0], cur[1], cur[2], cur[3]))
                sid = cur[4] + 1
            else:
                state.update((cur[0], cur[1], cur[2], cur[3], cur[4]))
                # re-arm the close timer; Spark requires it to sit beyond
                # the current watermark, so stale (but in-watermark) data
                # closes at the next watermark advance instead
                to_ms = cur[1] // 1000 + gap_seconds * 1000
                state.setTimeoutTimestamp(
                    max(to_ms, state.getCurrentWatermarkMs() + 1)
                )
        if out:
            yield pd.DataFrame(out)

    keyed = stream.select(
        F.col(key_col).cast("long").alias("k"), F.col(ts_col), F.col(value_col)
    ).withWatermark(ts_col, watermark)
    return keyed.groupBy("k").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
