"""Per-conversation turn-stream integrity digests.

The north rule's per-row invariant is "exact per-turn text equality
under stable (conv_id, turn_idx) ordering". At 10^12 turns you cannot
diff two tables row-by-row on a schedule; the operational primitive is
a per-conversation ORDER-SENSITIVE digest that any two copies of the
table (pre/post migration, batch vs streaming ingest, two clusters)
can compute independently and compare at conversation grain.

Design for scale:
  - one hash aggregate keyed on conv_id (map-side combined partial
    lists), no window sort and no applyInPandas: ordering happens
    per-group via `array_sort` on (turn_idx, md5(text)) structs;
  - the digest chains PER-TURN md5s (32 hex chars each), not raw text,
    so the aggregation state for a 10^5-turn whale conversation is
    ~3 MB regardless of text size — raw-text concat would be unbounded;
  - `contiguous` certifies the turn index stream is exactly 0..n-1
    (max+1 == n and min == 0 and no duplicates), i.e. the stable
    ordering is well-defined before the digest is trusted.

Every step is built-in JVM expressions (md5 / array_sort / transform /
concat_ws), bit-identical to the DuckDB oracle's
md5(string_agg(md5(text), '' ORDER BY turn_idx)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def turn_digest(
    df: DataFrame,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Order-sensitive per-conversation digest of the turn text stream.

    Output: conv_id, n_turns, contiguous (turn_idx is exactly 0..n-1),
    digest = md5 over the turn_idx-ordered concatenation of per-turn
    md5(text) hex strings.

    Tie order: rows sharing a turn_idx (a malformed conversation —
    contiguous=false) order by md5(text) within the index, because the
    digest sorts (turn_idx, md5) struct pairs. A cross-engine
    re-implementation must replay the same total order
    (``ORDER BY turn_idx, md5(text)``) for digests to match on
    malformed inputs; for contiguous=true streams plain
    ``ORDER BY turn_idx`` is already total.
    """
    pair = F.struct(
        F.col(order_col).alias("i"), F.md5(F.col(text_col)).alias("h")
    )
    # every integrity stat derives from the one collected array: a plain
    # count_distinct alongside collect_list would force Spark's
    # expand-based distinct aggregate (a second exchange) for a fact the
    # array already holds.
    sorted_pairs = F.array_sort(F.col("_pairs"))
    idx = F.transform(sorted_pairs, lambda s: s["i"])
    n = F.size(F.col("_pairs"))
    return (
        df.groupBy(F.col(key_col))
        .agg(F.collect_list(pair).alias("_pairs"))
        .select(
            key_col,
            n.cast("long").alias("n_turns"),
            (
                (F.element_at(idx, 1) == 0)
                & (F.element_at(idx, -1) == n - 1)
                & (F.size(F.array_distinct(idx)) == n)
            ).alias("contiguous"),
            F.md5(
                F.concat_ws(
                    "", F.transform(sorted_pairs, lambda s: s["h"])
                )
            ).alias("digest"),
        )
    )


def audit_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> dict:
    """Admission audit for a transcript batch — the write-audit-publish
    gate (SnapshotTable.publish audits=[...]) a landing batch must pass
    before it becomes visible to readers.

    Checks the row-level invariants a batch CAN certify about itself
    (cross-commit properties like whole-conversation contiguity belong
    to turn_digest over the full table, not to a partial-append audit):
    non-null conv_id / ts, non-negative turn_idx, and no duplicate
    (conv_id, turn_idx) keys within the batch.

    One aggregate pass, one collected row. Returns the violation counts
    when clean; raises ValueError naming them when not — which vetoes
    the publish and leaves the staged files for inspection.
    """
    c = (
        df.agg(
            F.count(F.lit(1)).alias("rows"),
            # coalesce: F.sum over an EMPTY batch is NULL, not 0
            F.coalesce(
                F.sum(F.when(F.col(conv_col).isNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias("null_conv_id"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(order_col).isNull() | (F.col(order_col) < 0),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("bad_turn_idx"),
            F.coalesce(
                F.sum(F.when(F.col(ts_col).isNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias("null_ts"),
            (
                F.count(F.lit(1))
                - F.count_distinct(F.col(conv_col), F.col(order_col))
            ).alias("dup_turn_keys"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(conv_col).isNull() | F.col(order_col).isNull(),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("_null_keys"),
        )
        .first()
        .asDict()
    )
    # count_distinct skips rows with a NULL key — those are already
    # counted by the null/bad counters, so subtract them from the dup
    # figure rather than double-reporting them as duplicates.
    c["dup_turn_keys"] = max(0, c["dup_turn_keys"] - c.pop("_null_keys"))
    bad = {
        k: v
        for k, v in c.items()
        if k != "rows" and v
    }
    if bad:
        raise ValueError(f"transcript batch failed admission audit: {bad}")
    return c
