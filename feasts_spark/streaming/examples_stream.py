"""Streaming SFT-context assembly — the streaming twin of
operators.examples.conversation_windows.

A live transcript stream wants each arriving turn turned into a training
example (the last-k-turn rolling context) at ingest time, without
rescanning the conversation. Per conversation, state holds a bounded
trailing buffer of the newest `buffer_turns` turns (parallel arrays:
turn_idx / role / text / ts); each micro-batch merges its rows in
(turn_idx-keyed — a re-delivered (conv, turn_idx) REPLACES its buffered
text and does NOT re-emit, so upstream at-least-once delivery stays
exactly-once downstream), then emits one context row per NEW turn_idx,
computed from the merged buffer with the SAME window rule as the batch
operator (role-prefixed pieces of the k-1 preceding buffered turns plus
the turn itself, joined on the separator).

Exactness contract, stated honestly:

- A stream delivering each conversation's turns in turn_idx order (the
  natural transcript cadence) emits rows IDENTICAL to the batch
  operator over the same data — asserted in tests.
- A late turn whose k-1 predecessors are still inside the buffer also
  emits exactly; but turns already emitted are never retracted, so a
  predecessor arriving AFTER its successor leaves the successor's
  earlier context stale (append-mode streaming cannot retract; the
  batch operator is the backfill path, same policy as the
  time-weighted twins).
- A turn arriving more than `buffer_turns` behind its conversation's
  newest buffered turn computes its context from what remains buffered
  (possibly fewer than k predecessors) — bounded state is the price of
  10^9 live conversations; size buffer_turns >= the reorder horizon.
- The exactly-once re-delivery guarantee holds WITHIN the buffer
  horizon: a (conv, turn_idx) replayed after its buffer entry was
  evicted is indistinguishable from a genuinely new late turn without
  unbounded emitted-id state, so it re-emits (with the degraded context
  above). Suppressing it would silently drop real late data — the
  wrong trade; dedup the (conv, turn_idx) key downstream if the source
  can replay beyond the buffer horizon.
- With a watermark in effect (always, and doubly so under
  idle_ttl_seconds' event-time timeout) the ENGINE drops input rows
  older than the watermark before this operator sees them — the
  standard streaming lateness contract everywhere in this repo. The
  emit-before-evict rule below concerns BUFFER eviction, not watermark
  lateness; the batch operator is the backfill path for
  beyond-watermark turns.

An event-time `idle_ttl_seconds` (watermark-driven) drops buffers of
conversations silent that long. The only shuffle keys on conv_id — the
same exchange the batch window pays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = (
    "idx array<int>, role array<string>, text array<string>, "
    "ts_us array<long>"
)


def stream_conversation_windows(
    stream: DataFrame,
    k: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
    sep: str = "\x1e",
    buffer_turns: int = 64,
    watermark: str = "10 minutes",
    idle_ttl_seconds: int | None = None,
) -> DataFrame:
    """Append stream of per-turn rolling k-context rows (module
    docstring). Output schema matches the batch operator:
    (conv, order, role, n_ctx, ctx_chars, ctx_digest, ctx)."""
    if k <= 0:
        raise ValueError("k must be positive")
    if buffer_turns < k:
        raise ValueError(
            f"buffer_turns={buffer_turns} must be >= k={k} — a smaller "
            "buffer could not even hold one full window")
    key_type = stream.schema[conv_col].dataType
    out_schema = T.StructType([
        T.StructField(conv_col, key_type),
        T.StructField(order_col, T.IntegerType()),
        T.StructField(role_col, T.StringType()),
        T.StructField("n_ctx", T.IntegerType()),
        T.StructField("ctx_chars", T.IntegerType()),
        T.StructField("ctx_digest", T.StringType()),
        T.StructField("ctx", T.StringType()),
    ])

    def fn(key, batches, state: GroupState):
        import hashlib

        (conv,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            idx, role, text, ts_us = (list(v) for v in state.get)
        else:
            idx, role, text, ts_us = [], [], [], []
        buf = dict(zip(idx, zip(role, text, ts_us)))

        new_rows = []
        for pdf in batches:
            pdf = pdf.dropna(subset=[order_col])
            for i, r, t, ts in zip(
                pdf[order_col].astype("int64"),
                pdf[role_col],
                pdf[text_col],
                pdf[ts_col],
            ):
                i = int(i)
                fresh = i not in buf
                buf[i] = (r, t, int(pd.Timestamp(ts).value // 1000))
                if fresh:
                    new_rows.append(i)

        # emit BEFORE eviction: every arriving turn produces a row, even
        # one so late the buffer will not retain it — its window is just
        # whatever predecessors remain buffered
        order = sorted(buf)

        def piece(j):
            # concat_ws semantics, matching the batch operator exactly:
            # NULL role or text is SKIPPED (no dangling separator)
            return ": ".join(
                x for x in buf[j][:2] if x is not None and x == x
            )

        rows = []
        for i in sorted(set(new_rows)):
            pos = order.index(i)
            window = order[max(0, pos - (k - 1)): pos + 1]
            ctx = sep.join(piece(j) for j in window)
            rows.append({
                conv_col: conv,
                order_col: i,
                role_col: buf[i][0],
                "n_ctx": len(window),
                "ctx_chars": len(ctx),
                "ctx_digest": hashlib.md5(ctx.encode()).hexdigest(),
                "ctx": ctx,
            })

        if len(order) > buffer_turns:  # keep only the NEWEST turns
            for i in order[: len(order) - buffer_turns]:
                del buf[i]
            order = order[len(order) - buffer_turns:]
        state.update((
            [int(i) for i in order],
            [buf[i][0] for i in order],
            [buf[i][1] for i in order],
            [buf[i][2] for i in order],
        ))
        if idle_ttl_seconds is not None and order:
            # idle = no EVENT activity: base the timeout on the newest
            # event time anywhere in the buffer, not the highest-idx
            # turn's — a conversation receiving only late (lower-idx)
            # turns is still active
            newest_us = max(v[2] for v in buf.values())
            to_ms = newest_us // 1000 + idle_ttl_seconds * 1000
            state.setTimeoutTimestamp(
                max(int(to_ms), state.getCurrentWatermarkMs() + 1)
            )
        if rows:
            yield pd.DataFrame(rows)

    keyed = stream.select(
        F.col(conv_col), F.col(order_col).cast("int").alias(order_col),
        F.col(role_col), F.col(text_col), F.col(ts_col),
    ).filter(F.col(ts_col).isNotNull()).withWatermark(ts_col, watermark)
    return keyed.groupBy(conv_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if idle_ttl_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
