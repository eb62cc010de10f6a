"""Dimension joins, anti-join detection, and state reconciliation
(reference J1–J7, A8).

Reference does every "join" as a Python dict lookup (J1/J2:
``INSTRUMENT_BY_TOKEN/SYMBOL``, ``config/instruments.py:206-207``), a set
difference (J3/J4), or a keyed compare loop (J5,
``checkpoint_manager.py:274-298``). Spark-first: broadcast hash joins for
the dims (178 rows ≪ the 10 MB auto-broadcast threshold), LEFT ANTI for
set differences, full outer + epsilon filter for reconciliation.

Scale: dimension joins never shuffle the fact side (broadcast); the anti
joins shuffle only the small candle grain, not raw ticks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_instruments(ticks: DataFrame, instruments: DataFrame, key: str = "token") -> DataFrame:
    """J1: token→instrument broadcast inner join; unknown tokens dropped
    (reference ``ws_client.py:177-179``)."""
    return ticks.join(F.broadcast(instruments), key, "inner")


def attach_segment(rows: DataFrame, instruments: DataFrame, key: str = "symbol") -> DataFrame:
    """J2: symbol→segment broadcast LEFT join (reference
    ``write_pipeline.py:100-103`` — missing symbol keeps the row)."""
    dim = instruments.select(key, "segment")
    return rows.join(F.broadcast(dim), key, "left")


def missing_symbols(expected: DataFrame, candles: DataFrame, key: str = "symbol") -> DataFrame:
    """J3: expected − present (reference ``gap_fill.py:54-56``)."""
    return expected.select(key).distinct().join(candles.select(key), key, "left_anti")


def reconcile_states(
    local: DataFrame,
    remote: DataFrame,
    key: str = "symbol",
    value_cols: tuple[str, ...] = ("last_close", "last_atr"),
    epsilon: float = 1e-4,
) -> DataFrame:
    """J5/A8: full outer join local vs sink ATR state; a row diverges when
    any value differs by > epsilon or exists on one side only (reference
    ``checkpoint_manager.py:274-298``)."""
    l = local.select(key, *[F.col(c).alias(f"local_{c}") for c in value_cols])
    r = remote.select(key, *[F.col(c).alias(f"remote_{c}") for c in value_cols])
    joined = l.join(r, key, "full_outer")
    diverged = F.lit(False)
    for c in value_cols:
        lc, rc = F.col(f"local_{c}"), F.col(f"remote_{c}")
        diverged = diverged | (lc.isNull() != rc.isNull()) | (F.abs(lc - rc) > epsilon)
    return joined.withColumn("diverged", diverged)


def adopt_fresher_state(
    local: DataFrame,
    remote: DataFrame,
    key: str = "symbol",
    order_col: str = "last_window_start",
) -> DataFrame:
    """Startup recovery cases A–D (reference
    ``checkpoint_manager.py:184-260``): per key, adopt whichever side has
    the fresher ``order_col`` — A: remote missing → local; B: equal →
    local (consistent); C: local ahead → local; D: remote ahead → remote.
    Adds a ``source`` column recording the decision."""
    lcols = [c for c in local.columns if c != key]
    l = local.select(key, *[F.col(c).alias(f"l_{c}") for c in lcols])
    r = remote.select(key, *[F.col(c).alias(f"r_{c}") for c in lcols])
    j = l.join(r, key, "full_outer")
    lo, ro = F.col(f"l_{order_col}"), F.col(f"r_{order_col}")
    use_local = ro.isNull() | (lo.isNotNull() & (lo >= ro))
    picked = [
        F.when(use_local, F.col(f"l_{c}")).otherwise(F.col(f"r_{c}")).alias(c)
        for c in lcols
    ]
    return j.select(
        key,
        *picked,
        F.when(use_local, F.lit("local")).otherwise(F.lit("remote")).alias("source"),
    )


def session_hours_gate(
    rows: DataFrame,
    calendar: DataFrame,
    ts_col: str = "ts",
    default_open: str = "09:15",
    default_close: str = "15:30",
) -> DataFrame:
    """J7+P3 combined with PER-DATE hours: special sessions (reference
    ``trading_calendar.py:79-95`` get_session_hours + the Muhurat entry in
    ``data/calendars/holidays_2026.json``) override the default market
    hours AND make otherwise-non-trading days (holidays, weekends)
    trading days for exactly their window.

    ``calendar`` is the ``load_calendar`` frame: holiday rows
    (is_holiday=true) and special-session rows (is_holiday=false with
    per-date open/close). Both dims stay broadcast — the fact side never
    shuffles, same posture as :func:`calendar_gate`."""
    dated = rows.withColumn("_d", F.to_date(ts_col))
    special = calendar.filter(~F.col("is_holiday")).select(
        F.col("date").alias("_d"),
        F.col("session_open").alias("_so"),
        F.col("session_close").alias("_sc"),
    )
    holidays = calendar.filter(F.col("is_holiday")).select(
        F.col("date").alias("_d"), F.lit(True).alias("_hol")
    )
    j = dated.join(F.broadcast(special), "_d", "left").join(
        F.broadcast(holidays), "_d", "left"
    )
    tod = F.date_format(ts_col, "HH:mm:ss")
    open_t = F.concat(F.coalesce(F.col("_so"), F.lit(default_open)), F.lit(":00"))
    close_t = F.concat(F.coalesce(F.col("_sc"), F.lit(default_close)), F.lit(":00"))
    is_trading_day = F.col("_so").isNotNull() | (
        F.col("_hol").isNull() & ~F.dayofweek("_d").isin(1, 7)
    )
    return j.filter(is_trading_day & (tod >= open_t) & (tod < close_t)).drop(
        "_d", "_so", "_sc", "_hol"
    )


def calendar_gate(rows: DataFrame, calendar: DataFrame, ts_col: str = "ts") -> DataFrame:
    """J7: keep rows whose date is a trading day. ``calendar`` is a small
    (date, is_holiday) dim (reference ``config/trading_calendar.py:60-95``
    + ``data/calendars/holidays_2026.json``), broadcast; weekends excluded
    by ``dayofweek``."""
    dated = rows.withColumn("_d", F.to_date(ts_col))
    holidays = calendar.filter(F.col("is_holiday")).select(F.col("date").alias("_d"))
    return (
        dated.join(F.broadcast(holidays), "_d", "left_anti")
        .filter(~F.dayofweek("_d").isin(1, 7))  # 1=Sunday, 7=Saturday
        .drop("_d")
    )
