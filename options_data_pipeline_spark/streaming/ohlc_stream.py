"""Streaming OHLC twin (reference §2.8 semantics).

Reference: WebSocket ticks → in-memory single-active-window OHLC buffer →
500 ms freeze grace after each boundary → snapshot/finalize → write
(``main.py:275-328``, ``candle_aggregator.py:94-177``). Spark-first:

 - event-time column + ``withWatermark(ts, 500 ms)`` reproduces the
   freeze→finalize lifecycle: in append mode a window emits exactly once,
   when the watermark passes its end — the reference's FROZEN transition
   (SURVEY.md §2.8 W3). Late ticks are dropped by the watermark, matching
   the reference's late-tick drop (``tick_buffer.py:119-121``); drop
   counts surface via StreamingQueryListener numRowsDroppedByWatermark.
 - the window state machine (COLLECTING→FREEZING→FROZEN) lives in the
   streaming aggregation state store — no user code.
 - at scale, state is partitioned by (symbol, window) across executors;
   watermark-driven eviction bounds it to the active window per key,
   exactly the reference's memory NFR (``01_ULTRA_PRD.md:72``).

first/last within a window use ``min_by/max_by`` on the arrival-order
``event_id``, same as the batch operator (scalar key → HashAggregate,
see operators/ohlc.py) — one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    rows: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop duplicate keys arriving within the
    watermark horizon (``dropDuplicatesWithinWatermark``) — the streaming
    face of the exact-dedup family (functions/dedupe.py) and the
    reference's at-source duplicate-tick guard. State holds one entry per
    key and the watermark EVICTS it — unlike plain ``dropDuplicates``,
    whose state grows without bound on an infinite stream. At 100 TB/day
    the horizon is the dedup contract: re-sends inside it are dropped,
    older re-sends are the sink-side idempotent append's job
    (streaming/sink.py) — two layers, bounded state each."""
    return rows.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_ohlc(
    ticks: DataFrame,
    interval: str = "5 minutes",
    watermark: str = "500 milliseconds",
    symbol_col: str = "symbol",
    price_col: str = "price",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """streaming ticks(symbol, price, ts, event_id) → append-mode candle
    stream; one row per (symbol, window) emitted at watermark passage."""
    order = F.col(order_col)
    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(F.col(symbol_col).alias("symbol"), F.window(ts_col, interval).alias("w"))
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


def tick_followups(
    ticks: DataFrame,
    horizon: str = "10 seconds",
    watermark: str = "5 seconds",
) -> DataFrame:
    """Stream-stream interval self-join: pair every tick with the SAME
    symbol's ticks arriving within ``horizon`` after it — the
    confirmation/echo pattern (a fill following an order, a quote
    following a trade). The one streaming capability the rest of the
    suite doesn't exercise: BOTH sides are unbounded, so Spark keeps a
    watermark-bounded buffer of each and the time-range predicate is
    what lets it EVICT — without the range bound on the event time the
    state would grow forever (Spark refuses such joins in append mode).

    State per side ≈ horizon+watermark of ticks per symbol partition —
    bounded, the same NFR contract as the OHLC window state. Works
    identically as a batch join (parity-tested): one definition, two
    execution modes, like streaming_ohlc."""
    a = ticks.withWatermark("ts", watermark).select(
        F.col("symbol"),
        F.col("ts").alias("ts_a"),
        F.col("event_id").alias("id_a"),
        F.col("price").alias("price_a"),
    )
    b = ticks.withWatermark("ts", watermark).select(
        F.col("symbol").alias("symbol_b"),
        F.col("ts").alias("ts_b"),
        F.col("event_id").alias("id_b"),
        F.col("price").alias("price_b"),
    )
    return (
        a.join(
            b,
            (F.col("symbol") == F.col("symbol_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {horizon}")),
        )
        .select(
            "symbol",
            "ts_a",
            "id_a",
            "ts_b",
            "id_b",
            (F.col("price_b") - F.col("price_a")).alias("price_delta"),
        )
    )


def streaming_vwap(
    ticks: DataFrame,
    interval: str = "5 minutes",
    watermark: str = "500 milliseconds",
) -> DataFrame:
    """Streaming VWAP twin of the batch ``vwap_5m`` query: decimal-exact
    price×qty and qty sums in the window state, one row per
    (symbol, window) at watermark passage; zero-volume windows emit NULL
    (same ANSI divide-by-zero guard as the batch side). Expects ticks
    already carrying a ``qty`` column (the JSON payload parse is the
    ingest projection's job, same as batch)."""
    return (
        ticks.withWatermark("ts", watermark)
        .groupBy(F.col("symbol"), F.window("ts", interval).alias("w"))
        .agg(
            F.sum(F.col("price").cast("decimal(12,2)") * F.col("qty")).alias("pq"),
            F.sum("qty").cast("long").alias("total_qty"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            F.when(
                F.col("total_qty") > 0,
                F.col("pq").cast("double") / F.col("total_qty").cast("double"),
            ).alias("vwap"),
            "total_qty",
            "n_ticks",
        )
    )
