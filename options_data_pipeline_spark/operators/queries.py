"""Sink read-queries & observability aggregates (reference A4–A9, O1–O5).

Reference: ad-hoc full-sheet scans (``modules/sheets/sheets_client.py:111-210``)
and a sorted ring-buffer percentile report (``ws_client.py:246-296``).
Spark-first: partition-prunable filters + exact/approx percentile
aggregates. ``F.percentile`` (exact, linear interpolation) matches
DuckDB's ``quantile_cont`` for oracle checks; at 100 TB swap to
``percentile_approx`` (t-digest sketch, single pass, mergeable) — both
exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def max_timestamp(sink: DataFrame, ts_col: str = "window_start") -> DataFrame:
    """A4: latest written window (reference ``sheets_client.py:188-210``)."""
    return sink.agg(F.max(ts_col).alias("max_ts"))


def existing_ids(sink: DataFrame, window_start, ts_col: str = "window_start") -> DataFrame:
    """A5: ids already written for one window (reference
    ``sheets_client.py:111-152``). The equality predicate partition-prunes."""
    return sink.filter(F.col(ts_col) == F.lit(window_start)).select("id")


def value_percentiles(
    df: DataFrame,
    value_col: str = "value",
    group_col: str | None = None,
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
    exact: bool = True,
) -> DataFrame:
    """A7: p50/p95/p99/max latency-style report (reference
    ``ws_client.py:246-296``)."""
    fn = F.percentile if exact else F.percentile_approx
    aggs = [
        fn(value_col, F.lit(p)).alias(f"p{int(p * 100)}") for p in probs
    ] + [F.max(value_col).alias("max_value"), F.count(F.lit(1)).alias("n")]
    if group_col:
        return df.groupBy(group_col).agg(*aggs)
    return df.agg(*aggs)


def buffer_stats(candles: DataFrame) -> DataFrame:
    """A9: symbols present + total ticks (reference ``tick_buffer.py:192-202``)."""
    return candles.agg(
        F.countDistinct("symbol").alias("n_symbols"),
        F.sum("tick_count").alias("total_ticks"),
        F.count(F.lit(1)).alias("n_candles"),
    )


def validate_ohlc(candles: DataFrame) -> DataFrame:
    """OHLC invariant check (reference ``candle_aggregator.py:205-216``):
    high >= max(open, close), low <= min(open, close), high >= low.
    Returns violating rows (empty = valid)."""
    return candles.filter(
        ~(
            (F.col("high") >= F.greatest("open", "close"))
            & (F.col("low") <= F.least("open", "close"))
            & (F.col("high") >= F.col("low"))
        )
    )
