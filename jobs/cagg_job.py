"""Continuous-aggregate deployment job — one scheduler tick per invocation.

    spark-submit --py-files dist/feasts_spark.zip jobs/cagg_job.py \
        --table-root /warehouse/transcripts \
        --ingest s3://landing/2024-03-01.parquet --ingest-id 2024-03-01 \
        --tiers 1m,1h,1d --features

Each tick: (1) append the landed transcript batch into the raw snapshot
table — idempotently, the ingest id commits atomically in the manifest
summary, so a re-run of a crashed tick skips an already-committed batch
(the streaming sink's exactly-once recipe at batch cadence); (2) refresh
every tier's ContinuousAggregate and optionally the FeatureView, each
resuming from its own atomic cursor. The whole tick is therefore safe to
re-run from the top after any crash: every step either no-ops or
completes what it started.

Tiers refresh as a CASCADE CHAIN: the finest tier caggs from the raw
delta, and each coarser tier re-aggregates from the previous tier's
table (CascadeAggregate) — one raw-delta scan per tick, then tier-sized
(~60:1 smaller) hops, the same composition the batch job's
rollup_cascade uses but with per-level cursors.

Prints ONE JSON line with per-step stats.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _already_ingested(raw, ingest_id: str) -> bool:
    """True when a commit carrying this ingest id exists. Manifest walk is
    the source of truth (atomic with the data); the sidecar set covers
    ids whose manifests were expired."""
    p = os.path.join(raw.meta_dir, "ingest-ids.json")
    if os.path.exists(p):
        with open(p) as f:
            if ingest_id in json.load(f).get("ids", []):
                return True
    for q in glob.glob(os.path.join(raw.meta_dir, "v*.json")):
        with open(q) as f:
            if json.load(f).get("summary", {}).get("ingest_id") == ingest_id:
                return True
    return False


def _record_ingested(raw, ingest_id: str) -> None:
    p = os.path.join(raw.meta_dir, "ingest-ids.json")
    ids = []
    if os.path.exists(p):
        with open(p) as f:
            ids = json.load(f).get("ids", [])
    if ingest_id not in ids:
        ids.append(ingest_id)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"ids": ids}, f)
    os.replace(tmp, p)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-root", required=True,
                    help="snapshot-table warehouse root (raw_turns + "
                         "tier_* + features tables live under it)")
    ap.add_argument("--ingest", default=None,
                    help="landed transcript parquet to append into the "
                         "raw table before refreshing")
    ap.add_argument("--ingest-id", default=None,
                    help="idempotence key for --ingest (defaults to the "
                         "input basename); a re-run with an "
                         "already-committed id skips the append")
    ap.add_argument("--tiers", default="1m,1h,1d")
    ap.add_argument("--features", action="store_true",
                    help="also refresh the per-conversation FeatureView")
    ap.add_argument("--feature-period", type=int, default=24)
    ap.add_argument("--min-series-len", type=int, default=20)
    ap.add_argument("--feature-buckets", type=int, default=256)
    ap.add_argument("--max-commits", type=int, default=8)
    ap.add_argument("--wap", action="store_true",
                    help="write-audit-publish ingest: stage the batch, "
                         "run the transcript admission audit "
                         "(integrity.audit_turns), and only publish on "
                         "pass — a failing batch never becomes visible; "
                         "its staged id is reported for inspection and "
                         "the tick exits 2")
    ap.add_argument("--tag", default=None,
                    help="after a fully successful tick, pin every "
                         "table's head version under this name (expire-"
                         "protected reproducible-corpus pin; a re-run "
                         "moves the same tag)")
    ap.add_argument("--no-key-blooms", action="store_true",
                    help="skip per-file conv_id blooms on the raw table "
                         "(they cost one column read per staged file at "
                         "ingest and buy file-level pruning for the "
                         "FeatureView's dirty-history scans)")
    args = ap.parse_args()

    from feasts_spark.operators.continuous import (
        CascadeAggregate, ContinuousAggregate, FeatureView,
    )
    from feasts_spark.session import get_spark
    from feasts_spark.sources.snapshots import SnapshotTable
    from feasts_spark.sources.transcripts import turn_series

    spark = get_spark(app_name="feasts_cagg_job")
    raw = SnapshotTable(
        spark, args.table_root, "raw_turns", stats_cols=("ts",),
        bloom_cols=() if args.no_key_blooms else ("conv_id",))

    out: dict = {"table_root": args.table_root, "steps": {}}
    if args.ingest:
        ingest_id = args.ingest_id or os.path.basename(
            args.ingest.rstrip("/"))
        if _already_ingested(raw, ingest_id):
            out["steps"]["ingest"] = {"ingest_id": ingest_id,
                                      "skipped": True}
        else:
            batch = turn_series(spark.read.parquet(args.ingest))
            if args.wap:
                from feasts_spark.operators.integrity import audit_turns
                from feasts_spark.sources.snapshots import AuditFailed

                sid = raw.stage(batch,
                                extra_summary={"ingest_id": ingest_id})
                try:
                    # publish audits once and retries only the manifest
                    # commit on conflict; infrastructure errors (expired
                    # staging, schema drift) propagate and crash the
                    # tick loudly — only a data-quality VETO takes the
                    # report-and-exit-2 path
                    v = raw.publish(sid, audits=[audit_turns])
                except AuditFailed as e:
                    # veto: head untouched, staged files retained for
                    # inspection (expire's grace sweep reclaims them
                    # eventually); the idempotence id is NOT recorded,
                    # so a corrected re-run re-ingests
                    out["steps"]["ingest"] = {
                        "ingest_id": ingest_id, "skipped": False,
                        "audit_failed": str(e), "staged_id": sid,
                    }
                    print(json.dumps(out))
                    sys.exit(2)
            else:
                v = raw.retrying(raw.append, batch,
                                 extra_summary={"ingest_id": ingest_id})
            _record_ingested(raw, ingest_id)
            out["steps"]["ingest"] = {"ingest_id": ingest_id,
                                      "skipped": False, "version": v}

    # chain: the finest tier caggs from raw; each subsequent tier
    # cascades from the previous tier's TABLE when it is that tier's
    # parent (tier-sized re-aggregation instead of a second raw-delta
    # scan), else falls back to raw
    from feasts_spark.operators.rollup import TIER_PARENT

    tick_tables: dict = {}
    prev_tier, prev_table = None, None
    for tier in args.tiers.split(","):
        tgt = SnapshotTable(spark, args.table_root, f"tier_{tier}",
                            stats_cols=("bucket_ts",))
        tick_tables[tgt.name] = tgt
        if prev_tier is not None and TIER_PARENT.get(tier) == prev_tier:
            cagg = CascadeAggregate(prev_table, tgt, tier)
            src_label = f"tier_{prev_tier}"
        else:
            cagg = ContinuousAggregate(raw, tgt, tier)
            src_label = "raw_turns"
        s = cagg.refresh(max_commits=args.max_commits)
        s["refreshed_from"] = src_label
        out["steps"][f"tier_{tier}"] = s
        prev_tier, prev_table = tier, tgt

    if args.features:
        ftg = SnapshotTable(spark, args.table_root, "features",
                            stats_cols=("_kb",))
        tick_tables[ftg.name] = ftg
        view = FeatureView(raw, ftg, period=args.feature_period,
                           min_points=args.min_series_len,
                           n_buckets=args.feature_buckets)
        out["steps"]["features"] = view.refresh(
            max_commits=args.max_commits)

    if args.tag:
        # tag the handles THIS tick built (raw + tiers + features), with
        # their real stats/bloom configs — plus any other snapshot table
        # on disk a previous tick shape left behind
        tables = {raw.name: raw, **tick_tables}
        for n in sorted(os.listdir(args.table_root)):
            if n not in tables and os.path.isdir(
                    os.path.join(args.table_root, n, "metadata")):
                tables[n] = SnapshotTable(spark, args.table_root, n)
        out["steps"]["tagged"] = {
            n: t.tag(args.tag, replace=True)
            for n, t in sorted(tables.items())
            if t.current_version() > 0
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
