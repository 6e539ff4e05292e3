"""Per-partition lineage manifest + resumable runs (north-rule component).

A run processes its input one *unit partition* at a time (default: one
day of data, `dt`). For each completed unit the manifest records
(run_id, partition, input_fingerprint, row_count, checksum, status) —
appended AFTER the unit's output is durably written with idempotent
overwrite-by-partition. Resuming a killed run anti-joins pending units
against the manifest and reprocesses only those; a unit interrupted
mid-write is simply overwritten (same bytes) on retry, so resume is
exactly-once at the unit level.

The manifest itself is an append-only parquet dir (tiny; one row per unit)
— on a cluster this would live in the Iceberg catalog or a metastore table.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = (
    "run_id string, partition string, input_fingerprint string, "
    "row_count long, checksum string, status string, completed_at double"
)


class CheckpointedRun:
    def __init__(self, spark: SparkSession, checkpoint_dir: str, run_id: str | None = None):
        self.spark = spark
        self.dir = checkpoint_dir
        self.manifest_path = os.path.join(checkpoint_dir, "_manifest")
        self.run_id = run_id or uuid.uuid4().hex[:12]

    # -- manifest --------------------------------------------------------
    def manifest(self) -> DataFrame:
        try:
            return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.manifest_path)
        except Exception:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def completed_partitions(self) -> set[str]:
        m = self.manifest().filter(F.col("status") == "done")
        return {r["partition"] for r in m.select("partition").distinct().collect()}

    def record(self, partition: str, fingerprint: str, row_count: int, checksum: str) -> None:
        row = [(self.run_id, partition, fingerprint, row_count, checksum, "done", time.time())]
        self.spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.manifest_path)

    # -- driver ----------------------------------------------------------
    def run(
        self,
        partitions: list[str],
        process_fn,
        fingerprint_fn=None,
        max_parallel_units: int = 1,
    ) -> dict:
        """Process pending partitions; returns metrics.

        process_fn(partition) -> (row_count, checksum); must write its own
        output idempotently (TableIO.overwrite_partitions).

        max_parallel_units > 1 submits that many units concurrently from a
        driver thread pool: Spark's scheduler interleaves their jobs, so
        one unit's driver-side floor (plan analysis, commit) overlaps
        another's executor compute — the standard backfill shape, and on a
        cluster the way a day-partition loop keeps the executors busy.
        Units write DISJOINT partitions (overwrite-by-partition), so
        concurrent commits do not contend on data; manifest appends are
        serialized under a lock. Exactly-once-per-unit resume semantics
        are unchanged: a unit is recorded only after its output is
        durably written, and a crash mid-pool simply leaves fewer
        recorded units for --resume to skip.
        """
        done = self.completed_partitions()
        pending = [p for p in partitions if p not in done]
        metrics = {"run_id": self.run_id, "total": len(partitions),
                   "skipped": len(partitions) - len(pending), "processed": 0}

        def unit(p: str) -> None:
            fp = fingerprint_fn(p) if fingerprint_fn else ""
            row_count, checksum = process_fn(p)
            with lock:
                self.record(p, fp, row_count, checksum)
                metrics["processed"] += 1

        if max_parallel_units <= 1:
            import threading

            lock = threading.Lock()
            for p in pending:
                unit(p)
            return metrics

        import threading
        from concurrent.futures import ThreadPoolExecutor

        lock = threading.Lock()
        with ThreadPoolExecutor(max_workers=max_parallel_units) as ex:
            futures = [ex.submit(unit, p) for p in pending]
            for f in futures:
                f.result()  # surface the first unit failure
        return metrics


def checksum_df(df: DataFrame) -> tuple[int, str]:
    """Order-insensitive (count, checksum) of a DataFrame — xor/sum of row
    hashes; used for manifest rows and resume-equality tests."""
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(" + "xxhash64(" + ", ".join(df.columns) + "))").alias("h"),
    ).collect()[0]
    return int(agg["n"]), format((agg["h"] or 0) & 0xFFFFFFFFFFFFFFFF, "016x")
