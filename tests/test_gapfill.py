"""Gap-fill tests — mirrors the reference tests/test_gap_fill.py:
flat candle at prev close with tick_count=0 + gap_filled flag; cold-start
(never-traded) slots unfillable; all-present no-op."""

from __future__ import annotations

from datetime import datetime

from options_data_pipeline_spark.operators.gapfill import gap_fill

W0 = datetime(2024, 1, 1, 9, 15)
W1 = datetime(2024, 1, 1, 9, 20)
W2 = datetime(2024, 1, 1, 9, 25)


def candles_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "symbol string, window_start timestamp, open double, high double,"
        " low double, close double, tick_count long",
    )


def test_gap_filled_flat_candle(spark):
    df = candles_df(
        spark,
        [("A", W0, 10.0, 12.0, 9.0, 11.0, 5), ("A", W2, 12.0, 13.0, 11.0, 12.5, 3)],
    )
    out = {r.window_start: r for r in gap_fill(df, 300).collect()}
    g = out[W1]
    assert (g.open, g.high, g.low, g.close) == (11.0, 11.0, 11.0, 11.0)
    assert g.tick_count == 0 and g.gap_filled
    assert not out[W0].gap_filled and not out[W2].gap_filled


def test_cold_start_unfillable_dropped(spark):
    """Symbol B has no candle before its gap → unfillable, not emitted
    (reference gap_fill.py 'never-traded' branch)."""
    df = candles_df(
        spark,
        [("A", W0, 10.0, 12.0, 9.0, 11.0, 5), ("B", W1, 5.0, 6.0, 4.0, 5.5, 2)],
    )
    out = gap_fill(df, 300).collect()
    b_rows = {r.window_start: r for r in out if r.symbol == "B"}
    assert W0 not in b_rows  # cold start — no prior close to fill from
    assert W1 in b_rows
    a_rows = {r.window_start: r for r in out if r.symbol == "A"}
    assert a_rows[W1].gap_filled and a_rows[W1].close == 11.0


def test_all_present_noop(spark):
    df = candles_df(
        spark,
        [("A", W0, 1.0, 2.0, 0.5, 1.5, 1), ("A", W1, 1.5, 2.5, 1.0, 2.0, 2)],
    )
    out = gap_fill(df, 300).collect()
    assert len(out) == 2 and not any(r.gap_filled for r in out)


def test_expected_universe_scaffold(spark):
    """An explicit symbols dim forces gap rows for symbols absent from the
    whole batch (reference expected-universe semantics)."""
    df = candles_df(spark, [("A", W0, 1.0, 2.0, 0.5, 1.5, 1)])
    symbols = spark.createDataFrame([("A",), ("B",)], "symbol string")
    out = gap_fill(df, 300, symbols=symbols).collect()
    # B has no prior close ever → all its slots unfillable → only A rows
    assert {r.symbol for r in out} == {"A"}
