"""Row-id / dedup-delta / dimension-join / reconciliation / calendar tests
(reference test_id_generator.py + test_checkpoint_manager.py intent)."""

from __future__ import annotations

from datetime import datetime

from options_data_pipeline_spark.operators.ids import with_row_id, dedup_delta
from options_data_pipeline_spark.operators.joins import (
    enrich_with_instruments,
    attach_segment,
    missing_symbols,
    reconcile_states,
    calendar_gate,
)


def test_row_id_format(spark):
    df = spark.createDataFrame(
        [("NIFTY", datetime(2026, 1, 7, 9, 20))], "symbol string, window_start timestamp"
    )
    [r] = with_row_id(df).collect()
    assert r.id == "NIFTY_20260107_0920"  # reference utils/id_generator.py:15-30


def test_dedup_delta_writes_only_complement(spark):
    batch = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    sink = spark.createDataFrame([("b",), ("x",)], "id string")
    out = {r.id for r in dedup_delta(batch, sink).collect()}
    assert out == {"a", "c"}


def test_instrument_join_drops_unknown_tokens(spark):
    ticks = spark.createDataFrame([("11536", 1.0), ("99999", 2.0)], "token string, price double")
    dim = spark.createDataFrame([("11536", "TCS", "nse_cm")], "token string, symbol string, segment string")
    out = enrich_with_instruments(ticks, dim).collect()
    assert len(out) == 1 and out[0].symbol == "TCS"


def test_segment_left_join_keeps_unknown_symbols(spark):
    rows = spark.createDataFrame([("TCS",), ("ZZZ",)], "symbol string")
    dim = spark.createDataFrame([("TCS", "nse_cm")], "symbol string, segment string")
    out = {r.symbol: r.segment for r in attach_segment(rows, dim).collect()}
    assert out == {"TCS": "nse_cm", "ZZZ": None}


def test_missing_symbols_anti_join(spark):
    expected = spark.createDataFrame([("A",), ("B",), ("C",)], "symbol string")
    present = spark.createDataFrame([("B",)], "symbol string")
    out = {r.symbol for r in missing_symbols(expected, present).collect()}
    assert out == {"A", "C"}


def test_reconciliation_epsilon(spark):
    """Divergence iff |local-remote| > 1e-4 or one-sided (reference
    checkpoint_manager.py:274-298)."""
    local = spark.createDataFrame(
        [("A", 10.0, 1.0), ("B", 20.0, 2.0), ("C", 30.0, 3.0)],
        "symbol string, last_close double, last_atr double",
    )
    remote = spark.createDataFrame(
        [("A", 10.00005, 1.0), ("B", 20.5, 2.0), ("D", 40.0, 4.0)],
        "symbol string, last_close double, last_atr double",
    )
    out = {r.symbol: r.diverged for r in reconcile_states(local, remote).collect()}
    assert out["A"] is False  # within epsilon
    assert out["B"] is True  # 0.5 > 1e-4
    assert out["C"] is True and out["D"] is True  # one-sided


def test_calendar_gate_drops_weekends_and_holidays(spark):
    rows = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5, 10, 0)),   # Friday — kept
            (2, datetime(2024, 1, 6, 10, 0)),   # Saturday — dropped
            (3, datetime(2024, 1, 7, 10, 0)),   # Sunday — dropped
            (4, datetime(2024, 1, 26, 10, 0)),  # holiday — dropped
        ],
        "event_id long, ts timestamp",
    )
    cal = spark.createDataFrame(
        [(datetime(2024, 1, 26).date(), True, "Republic Day")],
        "date date, is_holiday boolean, holiday_name string",
    )
    kept = {r.event_id for r in calendar_gate(rows, cal).collect()}
    assert kept == {1}
