"""Stream-stream event-time interval join — enriching one live stream
with another without materializing either (the last Structured Streaming
join surface the pipeline uses: candles enrich ticks the moment both
sides' watermarks allow, state evicts itself).

Reference mapping: the tick→candle enrichment (``main.py`` joins each
finalized window's rows back onto tick context) runs here as a single
continuous query instead of a materialize-then-read hop. Spark's
stream-stream inner join requires BOTH sides watermarked plus an
event-time RANGE predicate — that pair is what bounds the join state:
each side buffers only rows younger than (watermark − range), so state
size is rate × window, independent of stream lifetime. Without the range
condition Spark would have to keep every row forever (and rejects the
plan in append mode).

Scale posture: the join shuffles both streams by the equi-key (symbol) —
the same symbol-hash partitioning every stateful stage uses, so AQE-less
streaming still co-locates all of a symbol's state on one task; skewed
symbols shard the same way the batch ops do (salt the hot key upstream
if one instrument dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ticks_with_candles(
    ticks: DataFrame,
    candles: DataFrame,
    interval_seconds: int = 300,
    tick_watermark: str = "10 seconds",
    candle_watermark: str = "10 seconds",
) -> DataFrame:
    """Inner-join each tick to ITS OWN window's finalized candle:
    ``candle.window_start <= tick.ts < window_start + interval``.

    Output: tick columns + the window's OHLC (prefixed ``w_``) — the
    "tick in context" record an execution-quality monitor consumes
    (how far off the window's range did this trade print?).
    """
    t = ticks.withWatermark("ts", tick_watermark).alias("t")
    c = (
        candles.withWatermark("window_start", candle_watermark)
        .select(
            F.col("symbol").alias("c_symbol"),
            "window_start",
            F.col("open").alias("w_open"),
            F.col("high").alias("w_high"),
            F.col("low").alias("w_low"),
            F.col("close").alias("w_close"),
        )
        .alias("c")
    )
    cond = (
        (F.col("t.symbol") == F.col("c.c_symbol"))
        & (F.col("c.window_start") <= F.col("t.ts"))
        & (
            F.col("t.ts")
            < F.col("c.window_start") + F.expr(f"INTERVAL {interval_seconds} SECONDS")
        )
    )
    return t.join(c, cond, "inner").select(
        "t.symbol", "t.ts", "t.price", "t.event_id",
        "c.window_start", "w_open", "w_high", "w_low", "w_close",
    )
