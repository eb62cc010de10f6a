"""Tumbling-window OHLC aggregation (reference operators A1 + W1).

Reference: per-(ticker, 5-min window) incremental OHLC hash-agg with
arrival-ordered first/last (``modules/aggregator/tick_buffer.py:96-146``)
over strict event-time tumbling windows computed from a pre-built boundary
list (``utils/time_utils.py:167-224``).

Spark-first re-expression: ``groupBy(symbol, window(ts, interval))`` with
``min_by/max_by`` keyed on the monotonic ``event_id`` — the arrival-order
authority (the reference's open/close are arrival-ordered, not
event-time-ordered; SURVEY.md §7 risk 2). A scalar ordering key matters
for the physical plan: ``min_by(price, struct(ts, event_id))`` has a
struct aggregation buffer, which disqualifies HashAggregate and forces a
per-partition SortAggregate — measurably slower at scale. With a LongType
key the plan is a partial+final **HashAggregate** inside whole-stage
codegen; the single shuffle is on (symbol, window), exactly the grain of
the result — no narrower plan exists. (The driver data guarantees
event_id order ⊇ ts order; validated for all SFs in tools/.)

Scale: at 100 TB the input would be date-partitioned; window+symbol
grouping keys are high-cardinality and evenly spread, so the shuffle is
skew-free. AQE coalesces small post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_candles(
    ticks: DataFrame,
    interval: str = "5 minutes",
    symbol_col: str = "symbol",
    price_col: str = "price",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """ticks(symbol, price, ts, event_id) → candles, one row per
    (symbol, window_start): open/high/low/close/tick_count.

    Window assignment is inclusive-start / exclusive-end, matching the
    reference rule that a tick at exactly a boundary belongs to the NEW
    window (``time_utils.py:174-177``) — identical to ``F.window``.
    """
    order = F.col(order_col)
    return (
        ticks.groupBy(F.col(symbol_col).alias("symbol"), F.window(ts_col, interval).alias("w"))
        .agg(
            F.min_by(price_col, order).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, order).alias("close"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            "open",
            "high",
            "low",
            "close",
            "tick_count",
        )
    )


def sliding_ohlc(
    ticks: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    symbol_col: str = "symbol",
    price_col: str = "price",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Sliding (hopping) OHLC: overlapping windows of ``duration`` every
    ``slide`` — the smoothing view a trading dashboard layers over the
    tumbling candles (each tick lands in duration/slide windows).

    Same agg/tie-break contract as :func:`ohlc_candles`; the only plan
    difference is the window generator exploding duration/slide rows per
    tick BEFORE the hash agg — the shuffle stays on (symbol, window) and
    grows by exactly that small constant factor, nothing quadratic."""
    order = F.col(order_col)
    return (
        ticks.groupBy(
            F.col(symbol_col).alias("symbol"),
            F.window(ts_col, duration, slide).alias("w"),
        )
        .agg(
            F.min_by(price_col, order).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, order).alias("close"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "open",
            "high",
            "low",
            "close",
            "tick_count",
        )
    )


def resample_candles(
    candles: DataFrame, interval: str = "1 hour"
) -> DataFrame:
    """Resample finer candles into coarser ones (5m → 1h): open/close are
    the first/last child candle's open/close BY WINDOW TIME (candles are
    already time-keyed — no arrival-order key needed at this level),
    high/low/tick_count aggregate. The standard OHLC roll-up a charting
    layer requests at every zoom level; one hash agg at the coarser
    (symbol, window) grain — same single-shuffle shape as the base agg."""
    return (
        candles.groupBy(
            "symbol", F.window("window_start", interval).alias("w")
        )
        .agg(
            F.min_by("open", F.col("window_start")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col("window_start")).alias("close"),
            F.sum("tick_count").alias("tick_count"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            "open",
            "high",
            "low",
            "close",
            "tick_count",
        )
    )
