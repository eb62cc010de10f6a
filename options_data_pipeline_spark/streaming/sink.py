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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_append_batch(
    batch: DataFrame,
    sink_path: str,
    id_col: str = "id",
    prune_col: str | None = "window_start",
) -> int:
    """Anti-join ``batch`` against the sink on ``id`` and append the delta.
    Returns rows written. Prunes the sink read to the batch's key range
    when ``prune_col`` is given."""
    spark = batch.sparkSession
    delta = batch
    if os.path.isdir(sink_path) and any(
        f.endswith(".parquet") for f in os.listdir(sink_path)
    ):
        sink = spark.read.parquet(sink_path)
        if prune_col is not None:
            bounds = batch.agg(
                F.min(prune_col).alias("lo"), F.max(prune_col).alias("hi")
            ).collect()[0]
            if bounds.lo is not None:
                sink = sink.filter(
                    (F.col(prune_col) >= bounds.lo) & (F.col(prune_col) <= bounds.hi)
                )
        delta = batch.join(sink.select(id_col), id_col, "left_anti")
    delta = delta.cache()
    n = delta.count()
    if n:
        delta.write.mode("append").parquet(sink_path)
    delta.unpersist()
    return n


def overwrite_snapshot(df: DataFrame, sink_path: str) -> None:
    """S4: full-overwrite state snapshot (reference sync_atr_state,
    ``write_pipeline.py:328-362``)."""
    df.write.mode("overwrite").parquet(sink_path)


def foreach_batch_writer(sink_path: str, id_col: str = "id"):
    """foreachBatch hook: .writeStream.foreachBatch(foreach_batch_writer(p))."""

    def write(batch: DataFrame, batch_id: int) -> None:
        idempotent_append_batch(batch, sink_path, id_col)

    return write
