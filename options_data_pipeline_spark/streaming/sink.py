"""Idempotent micro-batch sink (reference S3/S4/S6/J4 semantics).

Reference: deterministic IDs + read-sink-then-anti-join dedup + retry +
fallback WAL (``write_pipeline.py:139-326``). Spark-first: ``foreachBatch``
with an anti-join-then-append against a parquet sink — replays of the same
micro-batch (after failure/restart) write nothing the second time because
their ids already exist. With a Delta/Iceberg sink this is a single
``MERGE WHEN NOT MATCHED INSERT`` (transactional); plain parquet keeps the
same logic minus atomicity, which Structured Streaming's checkpoint +
deterministic batch replay compensates.

The reference's retry ladder (5× exp backoff) and fallback WAL are
subsumed by Spark task retries + the streaming WAL; the ``atr_state``
full-overwrite snapshot (S4) maps to ``mode("overwrite")``.

Scale: the sink read for dedup is partition-pruned by the batch's window
range — never a full-sink scan (the reference's Q2 reads the whole sheet
per window, SURVEY.md §7 risk 5).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_has_data(sink_path: str) -> bool:
    """True when the sink directory holds any parquet file, at ANY depth —
    a (year, month)- or date-partitioned sink has only partition
    subdirectories at the top level, so a flat ``os.listdir`` probe would
    report "empty" and silently skip the dedup anti-join on replay."""
    if not os.path.isdir(sink_path):
        return False
    return any(
        f.endswith(".parquet")
        for _, _, files in os.walk(sink_path)
        for f in files
    )


def idempotent_append_batch(
    batch: DataFrame,
    sink_path: str,
    id_col: str = "id",
    prune_col: str | None = "window_start",
    partition_by: tuple[str, ...] = (),
) -> int:
    """Anti-join ``batch`` against the sink on ``id`` and append the delta.
    Returns rows written. Prunes the sink read to the batch's key range
    when ``prune_col`` is given; when ``partition_by`` includes a ``date``
    column the prune bounds also become partition filters so the dedup
    read touches only the batch's date partitions (never a full-sink
    scan)."""
    spark = batch.sparkSession
    delta = batch
    if sink_has_data(sink_path):
        sink = spark.read.parquet(sink_path)
        if prune_col is not None:
            bounds = batch.agg(
                F.min(prune_col).alias("lo"), F.max(prune_col).alias("hi")
            ).collect()[0]
            if bounds.lo is not None:
                sink = sink.filter(
                    (F.col(prune_col) >= bounds.lo) & (F.col(prune_col) <= bounds.hi)
                )
                if "date" in partition_by:
                    sink = sink.filter(
                        F.col("date").between(
                            F.lit(bounds.lo).cast("date"),
                            F.lit(bounds.hi).cast("date"),
                        )
                    )
        delta = batch.join(sink.select(id_col), id_col, "left_anti")
    delta = delta.cache()
    n = delta.count()
    if n:
        # Atomic-ish append: write the delta to a SIBLING staging dir,
        # then rename completed part-files into the sink one by one.
        # A crash mid-write leaves only the staging dir (invisible to sink
        # reads — no half-written parquet ever corrupts the sink); a crash
        # mid-promotion leaves some files moved (their ids dedup on
        # replay) and some staged (invisible, so the replay's anti-join
        # re-emits exactly those rows). Rename is atomic per file on a
        # real filesystem; object stores should swap this for a
        # manifest-commit (or a Delta/Iceberg MERGE) — same contract.
        import uuid

        staging = f"{sink_path.rstrip('/')}.staging-{uuid.uuid4().hex[:12]}"
        try:
            writer = delta.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(staging)
            _promote_staged(staging, sink_path)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    delta.unpersist()
    return n


def _promote_staged(staging: str, sink_path: str) -> None:
    """Move every completed parquet part-file from ``staging`` into the
    sink, preserving partition subdirectories. Idempotent-resumable: each
    move is a single atomic rename, and files are uniquified per batch so
    promotions never collide with prior appends."""
    tag = os.path.basename(staging).rsplit("-", 1)[-1]
    for root, _dirs, files in os.walk(staging):
        rel = os.path.relpath(root, staging)
        for f in files:
            if not f.endswith(".parquet"):
                continue  # _SUCCESS markers, .crc files
            dest_dir = sink_path if rel == "." else os.path.join(sink_path, rel)
            os.makedirs(dest_dir, exist_ok=True)
            os.rename(
                os.path.join(root, f), os.path.join(dest_dir, f"{tag}-{f}")
            )


def overwrite_snapshot(df: DataFrame, sink_path: str) -> None:
    """S4: full-overwrite state snapshot (reference sync_atr_state,
    ``write_pipeline.py:328-362``)."""
    df.write.mode("overwrite").parquet(sink_path)


def foreach_batch_writer(sink_path: str, id_col: str = "id"):
    """foreachBatch hook: .writeStream.foreachBatch(foreach_batch_writer(p))."""

    def write(batch: DataFrame, batch_id: int) -> None:
        idempotent_append_batch(batch, sink_path, id_col)

    return write
