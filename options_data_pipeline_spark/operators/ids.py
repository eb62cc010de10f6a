"""Deterministic row IDs + idempotent dedup delta (reference P6/J4/S6).

Reference: ``{ticker}_{YYYYMMDD_HHMM}`` is the "SOLE AUTHORITY for
deduplication" (``utils/id_generator.py:7-30``); before writing a window
batch the pipeline reads the sink's IDs for that window and writes only
the complement (``modules/pipeline/write_pipeline.py:151-183``).

Spark-first: ``concat_ws`` + ``date_format`` for the ID; the dedup delta
is a LEFT ANTI join against the sink restricted to the affected window —
at scale the sink side is partition-pruned by the window predicate
(replacing the reference's O(sink) full-sheet scan, SURVEY.md §7 risk 5).
With a Delta/Iceberg sink this becomes ``MERGE WHEN NOT MATCHED INSERT``;
plain-parquet fallback is anti-join + append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_id_col(symbol_col: str = "symbol", ts_col: str = "window_start") -> F.Column:
    return F.concat_ws("_", F.col(symbol_col), F.date_format(F.col(ts_col), "yyyyMMdd_HHmm"))


def with_row_id(candles: DataFrame, symbol_col: str = "symbol", ts_col: str = "window_start") -> DataFrame:
    return candles.withColumn("id", row_id_col(symbol_col, ts_col))


def dedup_delta(batch: DataFrame, sink: DataFrame, id_col: str = "id") -> DataFrame:
    """Rows of ``batch`` whose id is absent from ``sink`` (reference
    ``write_pipeline.py:151-183``). Caller should pre-filter ``sink`` to
    the affected window/date partitions so the scan is pruned."""
    return batch.join(sink.select(id_col), id_col, "left_anti")
