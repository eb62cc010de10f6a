"""Gap-fill: flat-candle synthesis for silent symbols (reference W4).

Reference (``modules/aggregator/gap_fill.py:32-88``): for each expected
symbol with no ticks in a window, emit a candle with O=H=L=C = last known
close, ``tick_count=0``, ``gap_filled=true``; symbols that have never
traded are "unfillable" and skipped.

Spark-first: dense scaffold (symbols × window boundaries) left-joined to
the observed candles, then a forward-fill of ``close`` via
``last(ignorenulls=True)`` over rows UNBOUNDED PRECEDING → 1 PRECEDING.
The scaffold windows come from ``F.sequence`` over the observed min/max
window (the reference pre-computes the session boundary list,
``time_utils.py:26-89``).

Scale: the scaffold is |symbols| × |windows per day| (13,350/day in the
reference) — tiny next to the tick volume, and generated per
symbol-partition so the only shuffle is the same symbol partitioning the
downstream TR/ATR already needs. At 100 TB, scaffold per date-partition so
it never materializes globally (SURVEY.md §4 item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    candles: DataFrame,
    interval_seconds: int = 300,
    symbols: DataFrame | None = None,
    cache: bool = True,
    handles: list[DataFrame] | None = None,
) -> DataFrame:
    """candles(symbol, window_start, open..close, tick_count) → densified
    candles + ``gap_filled`` flag; unfillable (no prior close) rows dropped.

    ``symbols`` optionally supplies the expected-universe dimension
    (reference ``config/instruments.py``); defaults to symbols observed in
    ``candles``.

    Plan shape: the scaffold (bounds + symbol universe) comes from ONE
    aggregate over ``candles`` — min/max window plus ``collect_set(symbol)``
    (the universe is bounded by contract: 178 in the reference, thousands
    at most) — then two explodes. ``candles`` is cached by default so the
    scaffold pass and the outer-join pass don't recompute the upstream
    OHLC aggregation from raw ticks (3 tick-table scans → 1 at 100 TB).
    """
    if cache:
        # The cache serves the scaffold pass + the join pass within THIS
        # plan. Long-lived callers must either pass cache=False (the
        # streaming densifier does) or collect the handle via ``handles``
        # and unpersist after the consuming action — a cache left behind
        # per invocation accumulates storage for the session's life.
        candles = candles.cache()
        if handles is not None:
            handles.append(candles)
    windows = F.explode(
        F.sequence("w_min", "w_max", F.expr(f"INTERVAL {interval_seconds} SECONDS"))
    ).alias("window_start")
    if symbols is None:
        scaffold = (
            candles.agg(
                F.min("window_start").alias("w_min"),
                F.max("window_start").alias("w_max"),
                F.collect_set("symbol").alias("syms"),
            )
            .select(windows, "syms")
            .select("window_start", F.explode("syms").alias("symbol"))
        )
    else:
        bounds = candles.agg(
            F.min("window_start").alias("w_min"), F.max("window_start").alias("w_max")
        )
        scaffold = symbols.crossJoin(F.broadcast(bounds.select(windows)))

    joined = scaffold.join(candles, ["symbol", "window_start"], "left")
    ffill = Window.partitionBy("symbol").orderBy("window_start").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_close = F.last("close", ignorenulls=True).over(ffill)
    is_gap = F.col("tick_count").isNull()
    fill = lambda c: F.when(is_gap, prev_close).otherwise(F.col(c))  # noqa: E731
    return (
        joined.select(
            "symbol",
            "window_start",
            fill("open").alias("open"),
            fill("high").alias("high"),
            fill("low").alias("low"),
            fill("close").alias("close"),
            F.coalesce("tick_count", F.lit(0)).alias("tick_count"),
            is_gap.alias("gap_filled"),
        )
        .filter(F.col("close").isNotNull())  # unfillable: no prior close yet
    )
