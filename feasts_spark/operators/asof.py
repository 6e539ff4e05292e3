"""As-of (backward) time join — enrich probe rows with the most recent
reference row at-or-before their timestamp, per series key.

The reference package has no as-of join (feasts works on a single
pre-joined tsibble), but a transcript/metrics engine needs one constantly:
"attach the latest rolled-up tier stats to each raw event", "join each
turn to the most recent model-config change". kdb's `aj`, DuckDB's
ASOF JOIN, and pandas' merge_asof define the semantics this mirrors:
for each left row, the right row with the greatest right_ts <= left_ts
(inclusive), optionally within a tolerance.

Spark-first shape — the UNION-MERGE algorithm, not a range join:

    union(right-tagged, left-tagged)
      -> window last_value(ignoreNulls) over (key ORDER BY ts, side)
      -> keep left rows

One shuffle total, keyed on the series key; no range-condition
cross-product, no bucket explosion, no skew amplification beyond what the
key distribution already has (same class as any per-key window — whales
are handled upstream by splitting keys, exactly as the rollup tier does
with salted_rollup). A broadcast-range join would need the right side
small; this shape works when BOTH sides are 100 TB-class.

Tie semantics: right rows sort before left rows at equal ts (side 0 < 1),
so an exactly-simultaneous reference row IS matched — identical to
DuckDB `ASOF JOIN ... ON l.ts >= r.ts` and pandas merge_asof
(allow_exact_matches=True). Right-side (key, ts) duplicates are resolved
by the caller-supplied `right_order` tiebreak column (last one wins,
deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Backward as-of join: left columns + matched right `value_cols` +
    `match_ts` (the matched right row's timestamp, null when no match or
    outside tolerance).

    `value_cols` must not collide with left column names. `right_order`
    breaks ties among right rows sharing (key, ts); when None the right
    side must be unique per (key, ts) (e.g. a rollup tier).
    """
    left_cols = left.columns
    clash = set(value_cols) & set(left_cols)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    # The output adds `match_ts`, and the union plan claims the
    # underscore-internal names below — a left frame already carrying
    # any of them would produce duplicate/ambiguous columns silently.
    reserved = {"match_ts", "_k", "_ts", "_side", "_rv", "_tie"}
    taken = reserved & (set(left_cols) | set(value_cols))
    if taken:
        raise ValueError(
            f"columns reserved by asof_join present in input: {sorted(taken)}"
        )

    # Tag and align the two sides onto one schema. Left rows carry nulls in
    # the right-value slot; right rows carry nulls in the left payload.
    # The right values travel as ONE struct: a per-column
    # last(ignorenulls) would skip right rows whose individual value is
    # legitimately NULL and stitch fields from different right rows —
    # the struct is non-null for every right row, so the whole matched
    # row wins or loses atomically (same as DuckDB ASOF / merge_asof).
    from pyspark.sql import types as T

    rv_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
        + [T.StructField("match_ts", right.schema[right_ts].dataType)]
    )
    r_tagged = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *(F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != key_col),
        F.struct(
            *(F.col(c) for c in value_cols),
            F.col(right_ts).alias("match_ts"),
        ).alias("_rv"),
        (F.col(right_order) if right_order is not None else F.lit(0)
         ).alias("_tie"),
    )
    l_tagged = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *(F.col(c) for c in left_cols if c != key_col),
        F.lit(None).cast(rv_type).alias("_rv"),
        # typed to match the right side's _tie so any orderable
        # right_order column (timestamp, string, ...) unions cleanly;
        # the left value is never compared within a side, so a constant
        # NULL is as good as 0
        (
            F.lit(None).cast(right.schema[right_order].dataType)
            if right_order is not None
            else F.lit(0)
        ).alias("_tie"),
    )

    merged = r_tagged.unionByName(l_tagged)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = merged.select(
        "*",
        F.last("_rv", ignorenulls=True).over(w).alias("_f"),
    ).filter(F.col("_side") == 1)

    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (
            F.col("_f.match_ts").cast("double")
            >= F.col("_ts").cast("double") - F.lit(float(tolerance_seconds))
        )
    )
    return filled.select(
        F.col("_k").alias(key_col),
        F.col("_ts").alias(left_ts),
        *(F.col(c) for c in left_cols if c not in (key_col, left_ts)),
        *(F.when(in_tol, F.col(f"_f.{c}")).alias(c) for c in value_cols),
        F.when(in_tol, F.col("_f.match_ts")).alias("match_ts"),
    )
