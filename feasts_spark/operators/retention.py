"""Retention / TTL enforcement for the rollup tiers.

The north rule's "rollup + downsample + retention engine": raw points age
out first, each coarser tier is kept longer, the coarsest forever. Two
layers, both Spark-first:

  enforce_retention — LOGICAL: a timestamp predicate on reads. It is a
      plain `ts >= cutoff` filter, so Catalyst pushes it into the parquet
      scan (PushedFilters) and, on a dt-partitioned table, prunes whole
      partitions — queries never touch expired data even before it is
      physically deleted.
  expire_partitions — PHYSICAL: drops aged-out dt partitions. On Iceberg
      this is `DELETE WHERE dt < cutoff` (a metadata operation); on the
      parquet-dir fallback it removes `dt=...` directories. Driver-side
      work is O(#days), never O(rows).

Policies are per-tier max ages; `None` means keep forever.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import DataFrame, functions as F

from feasts_spark.sources.tableio import TableIO

# Default tiered policy: raw turns age out first, 1d kept forever.
RETENTION_POLICY: dict[str, str | None] = {
    "raw": "30 days",
    "1m": "90 days",
    "1h": "730 days",
    "1d": None,
}


def _parse_age(age: str) -> _dt.timedelta:
    n, unit = age.split()
    n = int(n)
    unit = unit.rstrip("s")
    return {
        "day": _dt.timedelta(days=n),
        "hour": _dt.timedelta(hours=n),
        "week": _dt.timedelta(weeks=n),
    }[unit]


def retention_cutoff(
    now: _dt.datetime, tier: str, policy: dict | None = None
) -> _dt.datetime | None:
    """Earliest timestamp retained for `tier` (None = keep everything)."""
    policy = policy if policy is not None else RETENTION_POLICY
    age = policy.get(tier)
    if age is None:
        return None
    return now - _parse_age(age)


def enforce_retention(
    df: DataFrame,
    tier: str,
    now: _dt.datetime,
    policy: dict | None = None,
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Filter `df` to rows inside the tier's retention window.

    A single comparison against a literal — whole-stage codegen, pushed
    to the scan, partition-pruned on dt-partitioned tables.
    """
    cutoff = retention_cutoff(now, tier, policy)
    if cutoff is None:
        return df
    return df.filter(F.col(ts_col) >= F.lit(cutoff))


def expire_partitions(
    io: TableIO,
    name: str,
    tier: str,
    now: _dt.datetime,
    policy: dict | None = None,
    dt_col: str = "dt",
) -> list[str]:
    """Physically drop aged-out day partitions of `name`; returns the
    partition values removed. Metadata-only on Iceberg; directory removal
    on the parquet fallback. O(#days) driver work."""
    cutoff = retention_cutoff(now, tier, policy)
    if cutoff is None:
        return []
    cutoff_day = cutoff.date().isoformat()
    if getattr(io, "is_snapshot", False):
        # snapshot tables age days out as a manifest commit: files whose
        # footer dt-max is below the cutoff drop with zero data I/O, and
        # old snapshots still time-travel until expire_snapshots
        t = io.table(name)

        def _days(m):
            return {
                f["min"][dt_col]
                for f in m["files"]
                if f["min"].get(dt_col) is not None
                and f["min"][dt_col] == f["max"].get(dt_col)
            }

        before = _days(t.manifest())
        if t.retrying(t.delete_below, dt_col, cutoff_day) is None:
            return []
        after = _days(t.manifest())
        # report PARTITION VALUES like the other branches (a rewritten
        # straddle file's day survives in its new file, so it is not
        # counted as removed)
        return sorted(d for d in before - after if d < cutoff_day)
    if io.use_iceberg:
        io.spark.sql(f"DELETE FROM {name} WHERE {dt_col} < DATE '{cutoff_day}'")
        # Iceberg tracks removed partitions itself; report via metadata table
        return [f"< {cutoff_day}"]
    root = io._path(name)  # noqa: SLF001
    removed = []
    if not os.path.isdir(root):
        return removed
    for entry in sorted(os.listdir(root)):
        if not entry.startswith(f"{dt_col}="):
            continue
        day = entry.split("=", 1)[1]
        if day < cutoff_day:
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
            removed.append(day)
    return removed
