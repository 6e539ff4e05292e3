"""Range-serving deployment job — the READ path of the cagg warehouse.

    spark-submit --py-files dist/feasts_spark.zip jobs/serve_range.py \
        --table-root /warehouse/transcripts \
        --start "2024-03-01 05:17" --end "2024-03-25 21:43" \
        --out /exports/usage_march [--fresh] [--tiers 1m,1h,1d]

Answers "per-series summary over [start, end)" from the tier tables
jobs/cagg_job.py maintains, via calendar-aligned tier stitching
(operators/rollup.stitch_range): interior whole days read tier_1d,
ragged edges read tier_1h then tier_1m, a sub-minute remainder (only)
reads raw_turns. Raw points outside the remainder are never scanned.

--fresh makes the answer reflect data the scheduler tick hasn't
materialized yet: the FINEST tier serves through its real-time view
(ContinuousAggregate.read_fresh — committed tier rows plus the raw
table's un-refreshed tail, read-only), and every coarser tier is
DERIVED from the previous tier's frame by the exact cascade
re-aggregation (rollup_cascade) instead of reading its own — possibly
stale — table. A naive alternative (each tier's own read_fresh) would
be subtly wrong: a cascade tier's view is fresh only w.r.t. the
next-lower TABLE, so interior-day spans would silently miss raw rows
the 1m tier hasn't committed. Deriving keeps the whole stitched answer
equal to a from-scratch aggregate of raw at serve time; the bucket_ts
span predicates still push through the cascade aggregate into the tier
scan (grouping-column predicates), so the extra re-aggregation is
range-bounded, not table-sized.

Writes the result as parquet to --out and prints ONE JSON line
(rows, per-tier view modes, output path).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_ts(s: str) -> dt.datetime:
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise SystemExit(f"unparseable timestamp {s!r} "
                     "(want YYYY-MM-DD [HH:MM[:SS]])")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-root", required=True)
    ap.add_argument("--start", required=True)
    ap.add_argument("--end", required=True)
    ap.add_argument("--out", required=True,
                    help="parquet output path for the per-series frame")
    ap.add_argument("--tiers", default="1m,1h,1d",
                    help="tier tables to stitch from (subset of 1m,1h,1d; "
                         "the finest one bounds edge granularity)")
    ap.add_argument("--fresh", action="store_true",
                    help="serve through read-only real-time views: fold "
                         "each tier's un-refreshed source tail in "
                         "without committing anything")
    args = ap.parse_args()
    start, end = _parse_ts(args.start), _parse_ts(args.end)

    from feasts_spark.operators.continuous import (
        ContinuousAggregate,
        last_refreshed_source_version,
    )
    from feasts_spark.operators.rollup import (
        TIER_SECONDS,
        rollup_cascade,
        stitch_range,
    )
    from feasts_spark.session import get_spark
    from feasts_spark.sources.snapshots import SnapshotTable

    spark = get_spark(app_name="feasts_serve_range")
    raw = SnapshotTable(spark, args.table_root, "raw_turns",
                        stats_cols=("ts",))

    tiers = args.tiers.split(",")
    bad = set(tiers) - set(TIER_SECONDS)
    if bad:
        raise SystemExit(f"unknown tiers {sorted(bad)}; "
                         f"choose from {sorted(TIER_SECONDS)}")
    # finest-first regardless of how --tiers was typed: the fresh chain
    # derives coarser tiers from finer ones, and cascading the WRONG way
    # (day rows re-bucketed by hour) would silently drop edge spans
    tiers = sorted(tiers, key=lambda t: TIER_SECONDS[t])
    frames: dict = {}
    modes: dict = {}
    prev_tier = None
    for tier in tiers:
        tgt = SnapshotTable(spark, args.table_root, f"tier_{tier}",
                            stats_cols=("bucket_ts",))
        if args.fresh and prev_tier is None:
            # finest tier: real-time view over the raw table (the cursor
            # guard raises loudly if this tier was refreshed from some
            # other source — e.g. serving --tiers 1h on a 1m-chained
            # warehouse)
            cagg = ContinuousAggregate(raw, tgt, tier)
            frames[tier] = cagg.read_fresh()
            modes[tier] = cagg.last_view_mode
        elif args.fresh:
            frames[tier] = rollup_cascade(frames[prev_tier], tier)
            modes[tier] = f"cascaded_from_{prev_tier}"
        else:
            frames[tier] = tgt.read()
            modes[tier] = "committed"
        prev_tier = tier

    # sub-minute edges (if any) come straight from the raw table, with
    # ts-range manifest pruning. Freshness must be CONSISTENT across the
    # answer: --fresh reads the raw head (matching the views), committed
    # mode pins raw to the version the finest tier's cursor already
    # folded (standard raw-chained wiring) — otherwise a sub-minute edge
    # would include un-refreshed rows the tier spans exclude, an answer
    # equal to neither contract.
    if args.fresh:
        raw_frame = raw.read()
    else:
        finest_tgt = SnapshotTable(spark, args.table_root,
                                   f"tier_{tiers[0]}",
                                   stats_cols=("bucket_ts",))
        cur = last_refreshed_source_version(finest_tgt, f"cagg_{tiers[0]}")
        try:
            raw_frame = raw.read(version=cur) if cur else raw.read()
        except FileNotFoundError:  # cursor snapshot expired
            raw_frame = raw.read()
    res = stitch_range(
        frames, start, end,
        raw=raw_frame, key_col="conv_id", ts_col="ts", value_col="value",
    )
    res.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({
        "start": str(start), "end": str(end), "rows": n,
        "tier_modes": modes, "out": args.out,
    }))


if __name__ == "__main__":
    main()
