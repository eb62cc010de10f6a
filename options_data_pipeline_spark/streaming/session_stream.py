"""Streaming gap-sessionization — the W7 silence detector as a native
Structured Streaming stateful operator (reference ``ws_client.py:228-244``
ran a listener thread; the batch twin is the registry's ``tick_sessions``).

``session_window(ts, gap)`` is Spark's built-in merging session state:
ticks separated by less than ``gap`` merge into one growing session; a
session is FINALIZED (emitted in append mode) only once the event-time
watermark passes its close — i.e. the operator emits exactly the
"silence detected after N ticks" record, with the lateness bound made
explicit by the watermark instead of a thread's wall-clock timer.

Scale posture: state is one (start, end, aggregates) tuple per OPEN
session per symbol — bounded by the live-symbol universe, not by tick
volume; the shuffle is the same symbol-hash partitioning every keyed
stateful operator uses, and the watermark bounds state lifetime (a
symbol that goes silent forever still finalizes and evicts after
gap + delay). No driver-side anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    ticks: DataFrame,
    gap: str = "2 hours",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """tick stream → finalized-session stream (append mode).

    Output matches the batch ``tick_sessions`` query column-for-column
    (symbol, session_start, session_end, n_ticks) so closed sessions are
    directly comparable; ``session_end`` is Spark's convention — last
    tick + gap, the instant the silence alert fires."""
    return (
        ticks.withWatermark("ts", watermark_delay)
        .groupBy("symbol", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_ticks"))
        .select(
            "symbol",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_ticks",
        )
    )
