"""Streaming exact dedup — first-seen wins at ingest time.

The batch operator (operators.dedup.exact_dedup) groups the whole corpus;
its streaming twin must decide per arriving document whether the text was
seen before. Two layers:

  stream_dedup_exact      — Structured Streaming's built-in
      `dropDuplicatesWithinWatermark` on the text hash: state is bounded
      by the watermark window (the standard near-ingest dedup shape —
      duplicates in a pipeline overwhelmingly arrive close together:
      retries, double-submits, crawl refetches).
  stream_dedup_stateful   — applyInPandasWithState with one tiny state
      row per text-hash GROUP holding (first_id, n_dups); emits the
      first occurrence immediately and, for later arrivals, an updated
      duplicate count. Unbounded exact semantics, state O(#distinct),
      no per-row python (hashing happens JVM-side before the UDF).

Both key the only shuffle on md5(text) — same key the batch operator
groups by, so batch and stream agree on what is a duplicate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Append stream of first-seen rows; duplicates within the watermark
    window are dropped. State is bounded by the watermark."""
    hashed = stream.withColumn("_text_hash", F.md5(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_text_hash"])
        .drop("_text_hash")
    )


_STATE_SCHEMA = "first_id long, n_dups long"
_OUT_SCHEMA = "text_hash string, rep_id long, n_dups long, is_first boolean"


def stream_dedup_stateful(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact unbounded dedup: one output row per (micro-batch, text-hash)
    carrying the representative id and the running duplicate count.

    The representative is the minimum id of the FIRST micro-batch that
    carries the hash (within-batch row order after the state shuffle is
    nondeterministic, so min(id) is the deterministic tie-break); counts
    match exact_dedup exactly (asserted stream==batch in tests).
    """

    def fn(key, pdfs, state: GroupState):
        n_new = 0
        min_id = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = int(pdf[id_col].min())
            min_id = m if min_id is None else min(min_id, m)
            n_new += len(pdf)
        if n_new == 0:
            return
        if state.exists:
            (rep, n) = state.get
            is_first = False
        else:
            # row order within a state group is shuffle-read order, NOT
            # arrival order — min(id) is the deterministic tie-break for
            # duplicates landing in the same micro-batch (and matches
            # exact_dedup's min-id representative when they do)
            rep, n = min_id, 0
            is_first = True
        n += n_new
        state.update((rep, n))
        yield pd.DataFrame(
            [{
                "text_hash": key[0],
                "rep_id": rep,
                "n_dups": n,
                "is_first": is_first,
            }]
        )

    hashed = stream.select(
        F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col)
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
