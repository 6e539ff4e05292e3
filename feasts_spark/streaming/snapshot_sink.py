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

import glob
import json
import os

from pyspark.sql import DataFrame

from feasts_spark.sources.snapshots import SnapshotTable


def _watermark_path(table: SnapshotTable, sink_name: str) -> str:
    return os.path.join(table.meta_dir, f"sink-{sink_name}.json")


def last_committed_batch(table: SnapshotTable, sink_name: str) -> int:
    """Highest micro-batch id this sink has committed to `table` (-1 when
    none). Two sources, max wins:

    - retained manifests, walked newest-first with early exit (batch ids
      are monotone, so the first commit by this sink is the max —
      typically one manifest read per micro-batch, no full-history parse);
    - the sink's watermark sidecar, written AFTER each commit. The sidecar
      covers the case where compaction/retention commits followed by
      `expire_snapshots` removed every manifest carrying this sink's id —
      without it a re-delivered batch would append twice. Conversely a
      crash BETWEEN commit and sidecar write leaves the sidecar one
      behind, and the manifest scan covers that. Neither source alone is
      sufficient; together they are.
    """
    best = -1
    wm = _watermark_path(table, sink_name)
    if os.path.exists(wm):
        with open(wm) as f:
            best = int(json.load(f).get("batch_id", -1))
    versions = sorted(
        (
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(table.meta_dir, "v*.json"))
        ),
        reverse=True,
    )
    for v in versions:
        s = table.manifest(v).get("summary", {})
        if s.get("sink_name") == sink_name:
            return max(best, int(s.get("sink_batch_id", -1)))
    return best


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
        # watermark sidecar: survives snapshot expiry (see
        # last_committed_batch); written after the atomic commit, so a
        # crash here only leaves it one behind — covered by the manifest
        tmp = _watermark_path(table, sink_name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": int(batch_id)}, f)
        os.replace(tmp, _watermark_path(table, sink_name))

    return commit
