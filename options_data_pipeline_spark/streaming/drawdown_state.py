"""Streaming max-drawdown monitor — applyInPandasWithState.

The live twin of the batch ``max_drawdown`` registry query (the risk
statistic in the reference's ATR-family summary reads,
``atr_engine.py:244-257``): per symbol, track the running price peak and
the worst peak-to-trough decline seen so far, emitting the updated
summary every trigger — the "current drawdown" panel a risk monitor
polls, without rescanning history.

State per symbol is FOUR scalars + the trough coordinates
(peak, best_dd, trough_ts, trough_event_id, n_ticks) — sharded by the
symbol-hash shuffle exactly like the ATR state; restart recovery is the
checkpointLocation. Arithmetic is the batch query's op-for-op sequence
(dd = price/peak − 1, strict-< update keeps the FIRST minimal trough =
the batch struct-min's (drawdown, ts, event_id) tie-break), so a drained
stream's final rows equal the batch query bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "symbol string, peak double, max_drawdown double,"
    " trough_ts timestamp, trough_event_id long, n_ticks long"
)
STATE_SCHEMA = (
    "peak double, best_dd double, trough_ts timestamp,"
    " trough_event_id long, n_ticks long"
)


def _dd_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        peak, best_dd, trough_ts, trough_eid, n = state.get
    else:
        peak, best_dd, trough_ts, trough_eid, n = None, None, None, None, 0

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        if state.exists:
            state.update((peak, best_dd, trough_ts, trough_eid, n))
        return
    # multi-chunk groups arrive in arbitrary order — sort ONCE per
    # trigger so the peak recursion consumes ticks in event-time order
    # (same discipline as the ATR state twin)
    whole = pd.concat(chunks, ignore_index=True).sort_values(
        ["ts", "event_id"]
    )
    for row in whole.itertuples(index=False):
        price = float(row.price)
        peak = price if peak is None or price > peak else peak
        dd = price / peak - 1  # op-for-op the batch expression
        if best_dd is None or dd < best_dd:  # strict < keeps first trough
            best_dd, trough_ts, trough_eid = dd, row.ts, int(row.event_id)
        n += 1
    state.update((peak, best_dd, trough_ts, trough_eid, n))
    yield pd.DataFrame(
        {
            "symbol": [key[0]],
            "peak": [peak],
            "max_drawdown": [best_dd],
            "trough_ts": [trough_ts],
            "trough_event_id": [trough_eid],
            "n_ticks": [n],
        }
    )


def streaming_max_drawdown(ticks: DataFrame) -> DataFrame:
    """ticks (symbol, price, ts, event_id, …) → per-trigger running
    drawdown summaries, one row per active symbol per trigger (update
    output mode)."""
    return (
        ticks.groupBy("symbol")
        .applyInPandasWithState(
            _dd_update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
