"""Wilder ATR (reference operator W6) — the one genuinely stateful/recursive
operator, plus the per-ticker state summary (A3).

Reference semantics (``modules/atr/atr_engine.py:134-192``, spec
``Documentation/04_ULTRA_ATR_SPEC.md:12-29``):
 - warmup: first ``period-1`` candles → ATR NULL
 - at exactly ``period`` candles: ATR = arithmetic mean of the first
   ``period`` TRs
 - steady state: ``ATR = (prev_atr * (period-1) + TR) / period``
 - negative ATR clamped to 0

The recursion is NOT expressible as a built-in Spark window aggregate
(recursive EWMA with a mean-seeded init), so this is the engine's single
pandas-UDF island: ``groupBy(symbol).applyInPandas`` (SURVEY.md §4).
Per-key series are tiny relative to key cardinality (75 candles/day/ticker
in the reference), so at 100 TB the grouped-map parallelizes across
symbols×days and each Arrow batch stays small; the shuffle on symbol is
shared with the TR window partitioning.

Deviation from the reference (documented, deliberate): the reference
rounds ATR to 4 dp at every recursive step with Python banker's rounding
(``atr_engine.py:161,176``); we keep the recursion unrounded and round
only at the display edge — SURVEY.md §5 / FIXTURES.md §C rationale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ATR_PERIOD = 14  # reference config/settings.py:44


def _wilder(trs, period: int):
    """Sequential Wilder recursion over one symbol's ordered TR series."""
    out = []
    prev_atr = None
    acc = 0.0
    for i, tr in enumerate(trs):
        tr = float(tr)
        if prev_atr is None:
            acc += tr
            if i + 1 == period:
                prev_atr = acc / period
                out.append(max(prev_atr, 0.0))
            else:
                out.append(None)
        else:
            prev_atr = (prev_atr * (period - 1) + tr) / period
            out.append(max(prev_atr, 0.0))
    return out


def with_wilder_atr(
    candles_with_tr: DataFrame,
    period: int = ATR_PERIOD,
    symbol_col: str = "symbol",
    order_col: str = "window_start",
) -> DataFrame:
    """candles(symbol, window_start, ..., tr) → + atr column (nullable)."""
    in_schema = candles_with_tr.schema
    cols = [f.name for f in in_schema.fields]
    out_schema = T.StructType(list(in_schema.fields) + [T.StructField("atr", T.DoubleType())])

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        pdf["atr"] = _wilder(pdf["tr"].tolist(), period)
        return pdf

    return (
        candles_with_tr.select(cols)
        .groupBy(symbol_col)
        .applyInPandas(compute, schema=out_schema)
    )


def atr_summary(enriched: DataFrame, symbol_col: str = "symbol", order_col: str = "window_start") -> DataFrame:
    """Per-ticker state snapshot (reference A3, ``atr_engine.py:244-257``):
    last close, last ATR, candle count — the ``atr_state`` overwrite sink's
    payload (``write_pipeline.py:328-362``)."""
    order = F.col(order_col)
    return (
        enriched.groupBy(F.col(symbol_col).alias("symbol"))
        .agg(
            F.max_by("close", order).alias("last_close"),
            F.max_by("atr", order).alias("last_atr"),
            F.max(order).alias("last_window_start"),
            F.count(F.lit(1)).alias("candle_count"),
        )
    )
