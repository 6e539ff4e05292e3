"""Tiered continuous aggregates (rollups) — SURVEY.md §2.5.

The reference has no rollup machinery (feasts works on pre-bucketed
tsibbles; its only time bucketing is floor_tsibble_date, utils.R:122-174).
The north rule requires 1m/1h/1d retention tiers with re-aggregable
summaries. Design notes for cluster scale:

  - `date_trunc` (not `window()`) keeps the bucket a plain column Catalyst
    can partition-prune on, and matches the DuckDB oracle exactly.
  - Every aggregate is decomposable (sum/count/min/max + arg-min/arg-max
    pairs), so higher tiers re-aggregate from lower tiers WITHOUT touching
    raw data: 1h composes from 1m, 1d from 1h. At 10^12 rows this is the
    difference between scanning 100 TB once vs three times.
  - The groupBy is a hash partial/final aggregate (map-side combine) — one
    shuffle keyed on (key, bucket). Skewed keys are handled upstream by
    feasts_spark.operators.skew.salted_rollup.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, functions as F

TIERS = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
# which lower tier each tier composes from
TIER_PARENT = {"1h": "1m", "1d": "1h"}


def rollup_raw(
    df: DataFrame,
    tier: str,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Roll raw points into one row per (key, bucket).

    Output schema: key, bucket_ts, n_points, val_sum, val_min, val_max,
    val_first, val_last, val_avg (+ first/last timestamps used for tie-free
    re-aggregation).
    """
    trunc = TIERS[tier]
    bucket = F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts")
    v = F.col(value_col)
    return (
        df.groupBy(F.col(key_col).alias("series_key"), bucket)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(v).alias("val_sum"),
            F.min(v).alias("val_min"),
            F.max(v).alias("val_max"),
            F.min_by(v, F.col(ts_col)).alias("val_first"),
            F.max_by(v, F.col(ts_col)).alias("val_last"),
            F.min(F.col(ts_col)).alias("first_ts"),
            F.max(F.col(ts_col)).alias("last_ts"),
        )
        .withColumn("val_avg", F.col("val_sum") / F.col("n_points"))
    )


def rollup_cascade(lower: DataFrame, tier: str) -> DataFrame:
    """Compose a higher tier from the next-lower tier's rollup rows.

    All aggregates re-aggregate exactly: counts/sums add, min/max nest, and
    first/last carry their timestamps so arg-min/arg-max stay correct. The
    invariant `cascade(1m -> 1h) == rollup_raw(1h)` is tested bitwise.

    Plan note: this re-shuffle moves TIER-sized data (already ~60:1 smaller
    than raw for 1m), not raw rows. Hash-partitioning tiers by series_key
    alone would make every coarser re-aggregation shuffle-free
    (HashPartitioning(key) satisfies ClusteredDistribution(key, bucket)),
    but concentrates each whale key's full history in one partition — the
    (key, bucket) layout + salted_rollup is the skew-safe choice at scale.
    """
    trunc = TIERS[tier]
    bucket = F.date_trunc(trunc, F.col("bucket_ts")).alias("bucket_ts")
    return (
        lower.groupBy("series_key", bucket)
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("val_sum").alias("val_sum"),
            F.min("val_min").alias("val_min"),
            F.max("val_max").alias("val_max"),
            F.min_by(F.col("val_first"), F.col("first_ts")).alias("val_first"),
            F.max_by(F.col("val_last"), F.col("last_ts")).alias("val_last"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .withColumn("val_avg", F.col("val_sum") / F.col("n_points"))
    )


def rollup_tiers(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """Full tier pipeline: raw -> 1m -> 1h -> 1d (each from the previous)."""
    out = {"1m": rollup_raw(df, "1m", key_col, ts_col, value_col)}
    out["1h"] = rollup_cascade(out["1m"], "1h")
    out["1d"] = rollup_cascade(out["1h"], "1d")
    return out


def props_field_rollup(
    df: DataFrame,
    tier: str,
    field: str,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    props_col: str = "props",
) -> DataFrame:
    """Tier rollup over a numeric field extracted from a JSON-ish `props`
    payload column — the most common real-world events query: roll up a
    metric that lives inside the event's property bag, not in a typed
    column.

    `field` is a JSONPath fragment under the root object (``"k"`` ->
    ``$.k``). Extraction is `get_json_object` cast to double — pure JVM
    codegen in the scan projection, so at 100 TB the parquet reader prunes
    to (key, ts, props) and the cast happens before the one rollup
    shuffle; rows whose field is missing or non-numeric become NULL and
    are EXCLUDED from the rollup (count/sum/avg over present values only,
    matching SQL aggregate NULL semantics in the DuckDB
    ``json_extract_string(...)::DOUBLE`` twin). The output is
    rollup_raw's exact schema, so the result cascades, gap-fills and
    Gorilla-compresses like any other tier."""
    val = F.get_json_object(F.col(props_col), f"$.{field}").cast("double")
    src = df.select(
        F.col(key_col),
        F.col(ts_col),
        val.alias("_props_val"),
    ).filter(F.col("_props_val").isNotNull())
    return rollup_raw(src, tier, key_col, ts_col, "_props_val")


_MERGE_COLS = ["n_points", "val_sum", "val_min", "val_max", "val_first",
               "val_last", "first_ts", "last_ts"]


def rollup_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two rollup frames of the SAME tier into one: rows sharing a
    (series_key, bucket_ts) combine exactly (counts/sums add, min/max
    nest, first/last resolve by their carried timestamps — the same
    re-aggregation algebra as rollup_cascade, minus the bucket coarsening).
    Rows present in only one input pass through unchanged. This is the
    primitive behind late-data refresh: `merge(rollup(A), rollup(B)) ==
    rollup(A ∪ B)` bitwise for every column except val_sum/val_avg, which
    match to float re-association."""
    return (
        a.select("series_key", "bucket_ts", *_MERGE_COLS)
        .unionByName(b.select("series_key", "bucket_ts", *_MERGE_COLS))
        .groupBy("series_key", "bucket_ts")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("val_sum").alias("val_sum"),
            F.min("val_min").alias("val_min"),
            F.max("val_max").alias("val_max"),
            F.min_by(F.col("val_first"), F.col("first_ts")).alias("val_first"),
            F.max_by(F.col("val_last"), F.col("last_ts")).alias("val_last"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .withColumn("val_avg", F.col("val_sum") / F.col("n_points"))
    )


def invalidated_buckets(
    late_raw: DataFrame,
    tier: str,
    key_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The invalidation set of a late-arriving raw batch: the distinct
    (series_key, bucket_ts) pairs whose tier rows the batch dirties. At
    deployment this frame is the MERGE INTO / rewrite predicate — it is
    small by construction (bounded by the late batch, not the tier), so
    it broadcasts, and on a bucket-partitioned tier table it prunes the
    rewrite to the touched partitions only."""
    trunc = TIERS[tier]
    return late_raw.select(
        F.col(key_col).alias("series_key"),
        F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
    ).distinct()


def rollup_refresh(
    existing: DataFrame,
    late_raw: DataFrame,
    tier: str,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    broadcast_dirty: bool = True,
) -> DataFrame:
    """Incrementally refresh a continuous aggregate with a late-arriving
    raw batch: `rollup_refresh(rollup(on_time), late) == rollup(on_time ∪
    late)` — without re-aggregating the on-time data.

    The invalidation-log shape (how continuous-aggregate systems handle
    out-of-order data): compute the dirty (series_key, bucket_ts) set from
    the late batch, pass every CLEAN tier row through untouched, and
    re-merge only the dirty buckets' existing rows with the late batch's
    own rollup. With `broadcast_dirty` (the normal case — a late batch
    dirties a set bounded by its own size, not the tier's), both the anti
    join (clean pass-through) and the semi join (dirty selection) are
    broadcast hash joins: the tier scan never shuffles; the only exchange
    moves dirty-bucket rows plus the late rollup into the merge aggregate.
    At 10^12 turns a day's refresh touches ~1e-5 of the tier — this plan
    rewrites exactly that fraction, and `invalidated_buckets` doubles as
    the Iceberg MERGE predicate so even the rewrite I/O partition-prunes.

    Contract: `late_raw` must contain only rows NOT already aggregated
    into `existing` (the standard invalidation-log contract — replaying a
    batch double-counts; upstream checkpoint lineage / exact_dedup owns
    exactly-once delivery)."""
    dirty = invalidated_buckets(late_raw, tier, key_col, ts_col)
    if broadcast_dirty:
        dirty = F.broadcast(dirty)
    on = ["series_key", "bucket_ts"]
    clean = existing.join(dirty, on, "left_anti")
    touched = existing.join(dirty, on, "left_semi")
    late_tier = rollup_raw(late_raw, tier, key_col, ts_col, value_col)
    refreshed = rollup_merge(touched, late_tier)
    return clean.select(refreshed.columns).unionByName(refreshed)


# ----- range serving: calendar-aligned tier stitching -----------------------

_EPOCH = _dt.datetime(1970, 1, 1)


def _floor_ts(t: _dt.datetime, sec: int) -> _dt.datetime:
    es = int((t - _EPOCH).total_seconds() * 1_000_000)
    return _EPOCH + _dt.timedelta(microseconds=es - es % (sec * 1_000_000))


def _ceil_ts(t: _dt.datetime, sec: int) -> _dt.datetime:
    f = _floor_ts(t, sec)
    return f if f == t else f + _dt.timedelta(seconds=sec)


def cover_range(start: _dt.datetime, end: _dt.datetime,
                tiers: tuple = ("1d", "1h", "1m")) -> dict:
    """Greedy calendar-aligned cover of the half-open range [start, end)
    by tier buckets — the coarsest tier spans the middle, finer tiers fill
    toward the edges, and any sub-finest remainder lands under the "raw"
    key. Returned spans are disjoint, bucket-aligned, half-open, and
    union exactly to [start, end): ``{tier: [(lo, hi), ...], "raw": ...}``
    with at most 2 spans per finer tier (one per edge).

    Driver-side O(#tiers) datetime arithmetic — no Spark job. Alignment
    is w.r.t. the Unix epoch, which is what ``date_trunc`` does for
    minute/hour/day, so a span [lo, hi) at tier T covers exactly the
    bucket_ts values lo, lo+T, ..., hi-T."""
    tiers = tuple(sorted(tiers, key=lambda t: -TIER_SECONDS[t]))
    out: dict = {t: [] for t in tiers}

    def rec(s, e, idx):
        if s >= e:
            return
        if idx == len(tiers):
            out.setdefault("raw", []).append((s, e))
            return
        sec = TIER_SECONDS[tiers[idx]]
        lo, hi = _ceil_ts(s, sec), _floor_ts(e, sec)
        if lo >= hi:
            rec(s, e, idx + 1)
            return
        out[tiers[idx]].append((lo, hi))
        rec(s, lo, idx + 1)
        rec(hi, e, idx + 1)

    rec(start, end, 0)
    return out


def _span_filter(col, spans):
    cond = None
    for lo, hi in spans:
        c = (col >= F.lit(lo)) & (col < F.lit(hi))
        cond = c if cond is None else (cond | c)
    return cond


def stitch_range(
    tier_frames: dict,
    start: _dt.datetime,
    end: _dt.datetime,
    raw: DataFrame | None = None,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Serve an arbitrary-range aggregate from the COARSEST tiers that
    cover it: one row per series with the full summary (n_points,
    val_sum/min/max/avg, val_first/val_last + their timestamps) of the
    raw points in [start, end) — equal to aggregating the raw points
    directly, computed from tier rows only (the hierarchical
    continuous-aggregate serving trick: interior whole days read the 1d
    table, the ragged edges read hour then minute rows).

    `tier_frames` maps tier name -> that tier's EXACT rollup frame (from
    rollup_raw / a cagg table / read_fresh — same contract they all
    keep). Bounds not aligned to the finest provided tier need `raw` for
    the sub-bucket remainder; without it, unaligned bounds raise.

    At 10^12 turns: a 90-day dashboard range reads ~90 day-rows + <=48
    hour-rows + <=118 minute-rows per series — bucket_ts range predicates
    push to the scans (footer-pruned on snapshot tables) — then ONE
    hash aggregate keyed on series; raw points are never touched. The
    decomposable summary algebra (sums add, min/max nest, first/last
    resolve by carried timestamps) makes the stitched result exact, not
    approximate — float re-association on val_sum/val_avg only."""
    if start >= end:
        raise ValueError("empty range: start must precede end")
    unknown = set(tier_frames) - set(TIER_SECONDS)
    if unknown:
        raise ValueError(f"unknown tiers: {sorted(unknown)}")
    if not tier_frames:
        raise ValueError("tier_frames must provide at least one tier")
    spans = cover_range(start, end, tiers=tuple(tier_frames))
    if spans.get("raw") and raw is None:
        raise ValueError(
            f"range not aligned to the finest provided tier; pass raw= "
            f"for the sub-bucket remainder {spans['raw']}")

    parts = []
    for tier, tier_spans in spans.items():
        if tier == "raw" or not tier_spans:
            continue
        df = tier_frames[tier]
        parts.append(
            df.filter(_span_filter(F.col("bucket_ts"), tier_spans))
            .select("series_key", *_MERGE_COLS)
        )
    if spans.get("raw"):
        ts, v = F.col(ts_col), F.col(value_col)
        parts.append(
            raw.filter(_span_filter(ts, spans["raw"]))
            .groupBy(F.col(key_col).alias("series_key"))
            .agg(
                F.count(F.lit(1)).alias("n_points"),
                F.sum(v).alias("val_sum"),
                F.min(v).alias("val_min"),
                F.max(v).alias("val_max"),
                F.min_by(v, ts).alias("val_first"),
                F.max_by(v, ts).alias("val_last"),
                F.min(ts).alias("first_ts"),
                F.max(ts).alias("last_ts"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("series_key")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("val_sum").alias("val_sum"),
            F.min("val_min").alias("val_min"),
            F.max("val_max").alias("val_max"),
            F.min_by(F.col("val_first"), F.col("first_ts")).alias("val_first"),
            F.max_by(F.col("val_last"), F.col("last_ts")).alias("val_last"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .withColumn("val_avg", F.col("val_sum") / F.col("n_points"))
    )
