"""Streaming CDC upsert: maintain a latest-wins snapshot from a change
stream — the foreachBatch MERGE pattern (Delta/Iceberg upsert, Kafka
compacted-topic materialization) built on the batch operator
``operators/cdc.py::cdc_latest_snapshot``.

Each micro-batch merges into the stored snapshot by re-expressing the
snapshot's rows as pseudo-changes (their stored op and sequence) and
running latest-wins over (snapshot ∪ batch):

- a batch change NEWER than the stored row wins (update / delete);
- a batch change OLDER than the stored row loses — cross-batch
  out-of-order arrivals cannot regress the snapshot;
- a delete whose key later receives a newer insert resurrects it.

The stored table RETAINS delete rows as tombstones (``last_op`` =
delete) — the compacted-topic retention rule: without them, an
out-of-order insert arriving in a LATER micro-batch than the delete it
precedes would resurrect the key (caught by the first version of the
parity test). ``cdc_live_view`` filters tombstones for readers; a
production table would expire them after the max-lateness horizon.

The snapshot holds only keys + last_* columns, no cumulative counters
— that makes the merge IDEMPOTENT (merge(s, b) re-applied is a
fixpoint), so a replayed micro-batch after a crash converges to the
same snapshot with no applied-batch ledger. Audit counters belong to
the batch operator, whose input is the immutable change log.

Scale shape: the merge is one key-grain aggregate over
(snapshot ∪ batch) — at 100 TB the snapshot side would be a
key-partitioned table so only the batch's key partitions rewrite
(Delta MERGE / Iceberg merge-on-read); the single-directory overwrite
here mirrors the repo's S4 snapshot-sink contract
(reference write_pipeline.py:328-362 sync flow).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cdc import cdc_latest_snapshot
from .sink import overwrite_snapshot, sink_has_data


def cdc_merge_batch(
    batch: DataFrame,
    snapshot_path: str,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> int:
    """Merge one micro-batch of changes into the stored snapshot.
    Returns the stored row count after the merge (live + tombstones)."""
    spark = batch.sparkSession
    keys = list(key_cols)
    seqs = list(seq_cols)
    payload = [
        c for c in batch.columns if c not in set(keys) | set(seqs) | {op_col}
    ]
    changes = batch.select(*keys, *seqs, op_col, *payload)
    if sink_has_data(snapshot_path):
        prior = spark.read.parquet(snapshot_path).select(
            *keys,
            *[F.col(f"last_{c}").alias(c) for c in seqs],
            F.col("last_op").alias(op_col),
            *[F.col(f"last_{c}").alias(c) for c in payload],
        )
        changes = prior.unionByName(changes)
    snap = cdc_latest_snapshot(
        changes,
        key_cols=keys,
        seq_cols=seqs,
        op_col=op_col,
        delete_op=delete_op,
        payload_cols=payload,
        keep_deletes=True,  # tombstone retention — see module docstring
    ).drop("n_changes", "n_deletes")
    # the union re-reads the snapshot being overwritten: materialize the
    # merge result (executor-side, lineage cut from the input files)
    # before the overwrite truncates its own input
    merged = snap.localCheckpoint()
    n = merged.count()
    overwrite_snapshot(merged, snapshot_path)
    return n


def cdc_live_view(spark, snapshot_path: str, delete_op: str = "D") -> DataFrame:
    """The consumer-facing snapshot: stored rows minus tombstones."""
    return spark.read.parquet(snapshot_path).filter(
        F.col("last_op") != delete_op
    )


def streaming_cdc_upsert(
    stream: DataFrame,
    snapshot_path: str,
    checkpoint_dir: str,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
):
    """Wire a change stream into the snapshot store:
    ``streaming_cdc_upsert(...).start()`` + the checkpoint gives
    exactly-once snapshot maintenance (idempotent merge × at-least-once
    foreachBatch)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        cdc_merge_batch(
            batch,
            snapshot_path,
            key_cols=key_cols,
            seq_cols=seq_cols,
            op_col=op_col,
            delete_op=delete_op,
        )

    return (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
