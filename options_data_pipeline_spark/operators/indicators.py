"""Rolling technical indicators over candles (reference domain: the
options/TA pipeline's enrichment layer — ATR lives in operators/atr.py;
these are the window-frame siblings).

All plain window functions over (symbol ORDER BY window_start) ROWS
frames — per-symbol partitioned, no Python, exact DuckDB twins. At 100 TB
the shuffle is the same symbol partitioning every other enrichment step
already uses (one partitioning reused across TR/ATR/indicators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def donchian_channels(candles: DataFrame, n: int = 20) -> DataFrame:
    """Donchian channels: rolling n-candle max-high / min-low per symbol
    plus the channel position of the close in [0, 1] (breakout signal).
    max/min are float-exact cross-engine (no summation order hazard).
    Rows without a full lookback emit NULL channels (warmup, same policy
    as ATR)."""
    w = Window.partitionBy("symbol").orderBy("window_start").rowsBetween(
        -(n - 1), 0
    )
    full = F.count(F.lit(1)).over(w) >= n
    upper = F.when(full, F.max("high").over(w))
    lower = F.when(full, F.min("low").over(w))
    width = upper - lower
    pos = F.when(
        width > 0, (F.col("close") - lower) / width
    ).otherwise(F.lit(0.5))
    return candles.select(
        "symbol",
        "window_start",
        "close",
        upper.alias("dc_upper"),
        lower.alias("dc_lower"),
        F.when(full, pos).alias("dc_pos"),
    )


def sma(candles: DataFrame, n: int = 20, col: str = "close") -> DataFrame:
    """Simple moving average of ``col`` over the last n candles per
    symbol, NULL during warmup. The windowed mean is snapped to the 9-dp
    grid: sliding-frame SUM accumulation order is engine-internal, so the
    raw double can differ in the last ulp across engines (same policy as
    the PQ/ADC floats)."""
    w = Window.partitionBy("symbol").orderBy("window_start").rowsBetween(
        -(n - 1), 0
    )
    full = F.count(F.lit(1)).over(w) >= n
    return candles.select(
        "symbol",
        "window_start",
        F.col(col).alias("value"),
        F.when(full, F.round(F.avg(col).over(w), 9)).alias(f"sma_{n}"),
    )


def bollinger_bands(candles: DataFrame, n: int = 20, k: float = 2.0) -> DataFrame:
    """Bollinger bands: n-candle SMA ± k·σ (population) of the close per
    symbol, NULL during warmup — the volatility envelope next to Donchian
    (range-based) and ATR (true-range-based). Mean and σ both snap to the
    9-dp grid: windowed SUM accumulation order is engine-internal, and
    stddev implementations (Welford vs two-pass) differ in the last ulp
    across engines. Same single symbol-grain shuffle as sma/donchian."""
    w = Window.partitionBy("symbol").orderBy("window_start").rowsBetween(
        -(n - 1), 0
    )
    full = F.count(F.lit(1)).over(w) >= n
    mid = F.round(F.avg("close").over(w), 9)
    sd = F.round(F.stddev_pop("close").over(w), 9)
    return candles.select(
        "symbol",
        "window_start",
        "close",
        F.when(full, mid).alias("bb_mid"),
        F.when(full, F.round(mid - k * sd, 9)).alias("bb_lower"),
        F.when(full, F.round(mid + k * sd, 9)).alias("bb_upper"),
    )
