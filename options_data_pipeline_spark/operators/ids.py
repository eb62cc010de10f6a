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


#: ticker is GREEDY (may itself contain underscores — reference
#: ``utils/id_generator.py:44`` splits on the LAST two underscores),
#: then an 8-digit date and 4-digit time anchored at the end
_ID_RE = r"^(.+)_(\d{8})_(\d{4})$"


def parse_row_id_cols(id_col: str = "id") -> tuple[F.Column, F.Column]:
    """Reverse of :func:`row_id_col` (reference
    ``utils/id_generator.py:33-49``): (symbol, window_start) parsed back
    out of ``{ticker}_{YYYYMMDD}_{HHmm}``.

    Typed and total: where the reference raises ``ValueError`` on a
    malformed id, a Column can't raise per-row — invalid ids (wrong
    shape, empty ticker, or a calendar-impossible date/time like month
    13 or minute 61) yield NULL in BOTH outputs, so
    ``filter(window_start IS NULL)`` is the quarantine predicate.
    ``try_to_timestamp`` does the calendar validation JVM-side; verified
    bit-equal to DuckDB ``try_strptime`` across the edge-case grid.
    """
    c = F.col(id_col)
    ts = F.try_to_timestamp(
        F.concat_ws(
            " ",
            F.regexp_extract(c, _ID_RE, 2),
            F.regexp_extract(c, _ID_RE, 3),
        ),
        F.lit("yyyyMMdd HHmm"),
    )
    # both-or-neither: never emit a symbol for an id whose timestamp
    # failed validation (regexp_extract's ''-on-no-match would otherwise
    # leak an empty-string symbol for shape-invalid ids)
    sym = F.when(ts.isNotNull(), F.regexp_extract(c, _ID_RE, 1))
    return sym, ts


def parse_row_id(
    df: DataFrame,
    id_col: str = "id",
    symbol_out: str = "parsed_symbol",
    ts_out: str = "parsed_window_start",
) -> DataFrame:
    """Attach parsed (symbol, window_start) columns; NULLs on invalid ids."""
    sym, ts = parse_row_id_cols(id_col)
    return df.withColumn(symbol_out, sym).withColumn(ts_out, ts)


def dedup_delta(batch: DataFrame, sink: DataFrame, id_col: str = "id") -> DataFrame:
    """Rows of ``batch`` whose id is absent from ``sink`` (reference
    ``write_pipeline.py:151-183``). Caller should pre-filter ``sink`` to
    the affected window/date partitions so the scan is pruned."""
    return batch.join(sink.select(id_col), id_col, "left_anti")
