"""Exactly-once streaming parquet sink via foreachBatch + a batch-id commit
log.

Structured Streaming's foreachBatch gives at-least-once delivery: after a
crash between "sink write committed" and "checkpoint offset committed", the
SAME (batch_id, data) pair is replayed. A non-transactional sink would
duplicate those rows. The standard fix (Spark docs' "use the batchId to
deduplicate") is made concrete here:

* each micro-batch writes to ``<path>/batch_id=<id>/`` (its own directory —
  a replay overwrites byte-identically instead of appending duplicates);
* a marker file ``<path>/_commits/<id>`` is created AFTER the data write;
  a replayed batch whose marker already exists is skipped entirely;
* readers take ``<path>/batch_id=*/`` (partition-discovered), so a torn
  half-written directory without its marker is re-written on replay before
  any marker appears.

This is the streaming counterpart of export.export_with_manifests (same
write-then-mark protocol, per micro-batch instead of per bucket).

Scale notes: the marker is one empty file per micro-batch (no driver
state); data writes go through the normal distributed parquet writer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def make_idempotent_batch_writer(path: str, mode: str = "overwrite"):
    """Returns the (df, batch_id) function for ``writeStream.foreachBatch``.

    Exactly-once contract: if ``<path>/_commits/<batch_id>`` exists the
    batch is a replay and is skipped; otherwise the data lands under
    ``<path>/batch_id=<batch_id>/`` first and the marker is written last.
    """
    commits = os.path.join(path, "_commits")

    def write_batch(df: DataFrame, batch_id: int) -> None:
        os.makedirs(commits, exist_ok=True)
        marker = os.path.join(commits, str(batch_id))
        if os.path.exists(marker):
            return  # replayed micro-batch: already durably committed
        df.write.mode(mode).parquet(os.path.join(path, f"batch_id={batch_id}"))
        with open(marker, "w") as fh:
            fh.write("committed")

    return write_batch


def idempotent_parquet_sink(out: DataFrame, path: str, checkpoint: str):
    """writeStream wiring for the idempotent batch writer (availableNow
    trigger left to the caller via .trigger(...))."""
    return (
        out.writeStream.foreachBatch(make_idempotent_batch_writer(path))
        .option("checkpointLocation", checkpoint)
    )
