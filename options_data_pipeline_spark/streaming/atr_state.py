"""Streaming Wilder ATR — applyInPandasWithState (reference W6 + the
ATRState checkpoint doc, ``modules/atr/atr_engine.py:20-26,134-192``).

Reference state per ticker: (prev_close, prev_atr, tr_history, count),
persisted by CheckpointManager each window. Spark-first: the same tuple in
a GroupState keyed by symbol; the warmup history collapses to a running
(sum, count) because the seed only needs the MEAN of the first 14 TRs.
Checkpoint/recovery (reference ``checkpoint_manager.py:47-260``) is the
streaming query's ``checkpointLocation`` — offsets + state store survive
restarts with no user code.

Scale: state is ~4 scalars per symbol — trivially sharded by the
symbol-hash shuffle; the pandas batches are per-trigger per-symbol.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.atr import ATR_PERIOD

OUTPUT_SCHEMA = (
    "symbol string, window_start timestamp, open double, high double, low double,"
    " close double, tick_count long, gap_filled boolean, tr double, atr double"
)
STATE_SCHEMA = "prev_close double, prev_atr double, tr_sum double, n long"


def _atr_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    period: int = ATR_PERIOD,
) -> Iterator[pd.DataFrame]:
    """Consume this trigger's candles for one symbol in window order,
    advancing (prev_close, prev_atr, tr_sum, n) exactly like the batch
    recursion in operators/atr.py."""
    if state.exists:
        prev_close, prev_atr, tr_sum, n = state.get
    else:
        prev_close, prev_atr, tr_sum, n = None, None, 0.0, 0

    # A symbol's rows in one trigger may arrive as SEVERAL Arrow chunks
    # (> spark.sql.execution.arrow.maxRecordsPerBatch rows) in arbitrary
    # order — materialize the whole group and sort ONCE, or the Wilder
    # recursion would consume candles out of window order. Per-key series
    # are small (a day of 5-minute candles) so the concat is safe.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        state.update((prev_close, prev_atr, tr_sum, n))
        return
    whole = pd.concat(chunks, ignore_index=True).sort_values("window_start")

    out = []
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
                # present only downstream of the densify stage
                "gap_filled": getattr(row, "gap_filled", None),
                "tr": tr,
                "atr": None if atr is None else max(atr, 0.0),
            }
        )

    state.update((prev_close, prev_atr, tr_sum, n))
    if out:
        yield pd.DataFrame(out)


def streaming_atr(candles: DataFrame) -> DataFrame:
    """candle stream → enriched stream with tr/atr, state carried per
    symbol across triggers."""
    return candles.groupBy("symbol").applyInPandasWithState(
        _atr_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
