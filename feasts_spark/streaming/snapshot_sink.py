"""Structured Streaming sink committing micro-batches into snapshot tables.

foreachBatch gives at-least-once delivery: after a crash, the last
micro-batch re-runs with the SAME batch_id. Exactly-once therefore needs an
idempotent commit — here the batch_id is recorded in the snapshot
manifest's summary at commit time, and a re-delivered batch whose id was
already committed for this sink name is skipped. That is the same
transactional-sink recipe Spark's docs prescribe for foreachBatch
(batchId-keyed dedup in the target store), with the snapshot manifest as
the transaction log: the atomic O_EXCL manifest create commits the data
files AND the batch id in one step, so there is no window where rows are
visible but the id is not (or vice versa).

Composition with the streaming operators: `stream_rollup` in append output
mode emits each watermark-closed bucket exactly once, so plain `append`
commits are correct — no merge needed. For out-of-order data beyond the
watermark, the batch `rollup_refresh` + `replace_where` path picks up
where the stream's watermark gave up (tests/test_rollup_refresh.py pins
that composition).

At scale each micro-batch is one manifest commit (O(#files) driver-side
JSON); `SnapshotTable.compact` bin-packs the resulting small files in the
background without disturbing readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from feasts_spark.sources.snapshots import SnapshotTable


def last_committed_batch(table: SnapshotTable, sink_name: str) -> int:
    """Highest micro-batch id this sink has committed to `table` (-1 when
    none). Walks manifests newest-first and stops at the first commit by
    this sink — batch ids increase monotonically, so the newest is the
    max; typically O(1) manifest reads per micro-batch. Snapshot expiry
    keeps the newest manifests, which still covers foreachBatch's
    re-delivery window (exactly the LAST batch)."""
    for v in sorted(
        (r["version"] for r in table.history()), reverse=True
    ):
        s = table.manifest(v).get("summary", {})
        if s.get("sink_name") == sink_name:
            return int(s.get("sink_batch_id", -1))
    return -1


def snapshot_batch_writer(table: SnapshotTable, sink_name: str = "stream"):
    """Build the foreachBatch function: idempotent atomic append of each
    micro-batch into `table`.

    `sink_name` identifies the logical stream: batch ids are compared per
    sink name, so a REPROCESSING run (fresh checkpoint, ids restart at 0)
    must use a new sink_name or a fresh table — with the old name its
    early batches would be mistaken for re-deliveries and skipped.

    Usage::

        q = (stream_rollup(src, "1h").writeStream
             .foreachBatch(snapshot_batch_writer(tier_table, "rollup_1h"))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= last_committed_batch(table, sink_name):
            return  # re-delivered after a crash: already committed
        if batch_df.isEmpty():
            return  # nothing closed this trigger; no empty manifest churn
        table.retrying(
            table.append, batch_df,
            extra_summary={"sink_name": sink_name,
                           "sink_batch_id": int(batch_id)},
        )

    return commit
