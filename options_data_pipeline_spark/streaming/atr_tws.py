"""Streaming Wilder ATR on the transformWithStateInPandas API — the
modern twin of :mod:`atr_state` (same semantics, same output schema,
reference W6 / ``modules/atr/atr_engine.py:20-26,134-192``).

Why both: ``applyInPandasWithState`` is the stable GroupState API;
``transformWithStateInPandas`` (Spark 4 state-v2) adds composite state
types, TTL and timers, and requires the RocksDB state store. Here the
Wilder tuple maps onto a single ``ValueState`` and an idle TIMER emits a
heartbeat row into the state snapshot output — the reference's
"silence detected" alert (``ws_client.py:228-244``) expressed as an
operator-level timer instead of a listener thread.

Equivalence with the batch recursion (operators/atr.py) and the
GroupState twin is pinned by tests; the sizing posture is identical
(~4 scalars per symbol, sharded by the symbol-hash shuffle).

ENVIRONMENT GATE: state-v2's Python↔JVM state server speaks protobuf;
``google.protobuf`` is not installed in this container (and installs are
off-limits), so the end-to-end streaming test auto-skips here and the
processor's recursion/chunk-ordering logic is unit-tested directly
against the batch oracle with a fake handle. On a cluster with protobuf
present this runs as-is.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from ..operators.atr import ATR_PERIOD
from .atr_state import OUTPUT_SCHEMA, STATE_SCHEMA

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class WilderATRProcessor(StatefulProcessor):
    """Per-symbol (prev_close, prev_atr, tr_sum, n) in one ValueState,
    advanced by the exact batch recursion."""

    def __init__(self, period: int = ATR_PERIOD, idle_timeout_ms: int | None = None):
        self._period = period
        self._idle_timeout_ms = idle_timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("wilder", STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            prev_close, prev_atr, tr_sum, n = self._state.get()
        else:
            prev_close, prev_atr, tr_sum, n = None, None, 0.0, 0

        chunks = [pdf for pdf in rows if len(pdf)]
        if not chunks:
            return
        # multi-chunk groups arrive in arbitrary order — sort ONCE before
        # the recursion (same hazard as the GroupState twin)
        whole = pd.concat(chunks, ignore_index=True).sort_values("window_start")

        out = []
        period = self._period
        for row in whole.itertuples(index=False):
            high, low, close = float(row.high), float(row.low), float(row.close)
            if prev_close is None:
                tr = high - low
            else:
                tr = max(high - low, abs(high - prev_close), abs(low - prev_close))
            n += 1
            if prev_atr is None:
                tr_sum += tr
                atr = tr_sum / period if n == period else None
                prev_atr = atr
            else:
                prev_atr = (prev_atr * (period - 1) + tr) / period
                atr = prev_atr
            prev_close = close
            out.append(
                {
                    "symbol": row.symbol,
                    "window_start": row.window_start,
                    "open": float(row.open),
                    "high": high,
                    "low": low,
                    "close": close,
                    "tick_count": int(row.tick_count),
                    "gap_filled": getattr(row, "gap_filled", None),
                    "tr": tr,
                    "atr": None if atr is None else max(atr, 0.0),
                }
            )

        self._state.update((prev_close, prev_atr, tr_sum, n))
        if self._idle_timeout_ms is not None:
            # heartbeat: re-arm an idle timer; silence beyond the timeout
            # fires handleExpiredTimer (reference heartbeat monitor)
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self._idle_timeout_ms
            )
        yield pd.DataFrame(out)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: Any
    ) -> Iterator[pd.DataFrame]:
        # one marker row: window_start NULL, tick_count -1 — downstream
        # alerting filters on it (kept in-band so the output schema is
        # unchanged)
        if self._state.exists():
            prev_close, prev_atr, _tr_sum, _n = self._state.get()
        else:
            prev_close, prev_atr = None, None
        yield pd.DataFrame(
            [
                {
                    "symbol": key[0] if isinstance(key, (tuple, list)) else key,
                    "window_start": None,
                    "open": None,
                    "high": None,
                    "low": None,
                    "close": prev_close,
                    "tick_count": -1,
                    "gap_filled": None,
                    "tr": None,
                    "atr": prev_atr,
                }
            ]
        )

    def close(self) -> None:
        pass


def streaming_atr_tws(
    candles: DataFrame,
    period: int = ATR_PERIOD,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """candle stream → enriched stream, transformWithStateInPandas flavor.
    The session must run the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = ROCKSDB_PROVIDER``);
    state-v2 requires it."""
    return candles.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=WilderATRProcessor(period, idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime" if idle_timeout_ms is not None else "None",
    )
