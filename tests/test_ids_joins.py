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


def test_session_hours_gate_special_sessions(spark):
    """Reference get_session_hours parity: a special session overrides the
    day's hours AND turns a holiday/weekend into a trading day for exactly
    its window; plain holidays drop entirely; normal days keep default
    hours."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from options_data_pipeline_spark.operators.joins import session_hours_gate

    cal = spark.createDataFrame(
        [
            ("2026-11-09", True, "Diwali", None, None),      # holiday...
            ("2026-11-09", False, "Muhurat", "18:15", "19:45"),  # ...with session
            ("2026-11-14", False, "Weekend Special", "10:00", "12:00"),  # Saturday
            ("2026-11-11", True, "Plain Holiday", None, None),
        ],
        "d string, is_holiday boolean, holiday_name string,"
        " session_open string, session_close string",
    ).select(
        F.to_date("d").alias("date"), "is_holiday", "holiday_name",
        "session_open", "session_close",
    )

    def t(day, hm):
        h, m = hm.split(":")
        return datetime(2026, 11, day, int(h), int(m))

    rows = [
        ("A", 1.0, t(9, "18:30"), 1),   # Muhurat window → KEPT
        ("A", 1.0, t(9, "10:00"), 2),   # Muhurat day, default hours → dropped
        ("A", 1.0, t(9, "19:45"), 3),   # close is exclusive → dropped
        ("A", 1.0, t(14, "10:30"), 4),  # Saturday special → KEPT
        ("A", 1.0, t(14, "13:00"), 5),  # Saturday outside special → dropped
        ("A", 1.0, t(11, "10:30"), 6),  # plain holiday → dropped
        ("A", 1.0, t(10, "10:30"), 7),  # normal Tuesday default hours → KEPT
        ("A", 1.0, t(10, "16:00"), 8),  # normal day after close → dropped
        ("A", 1.0, t(15, "10:30"), 9),  # plain Sunday → dropped
    ]
    ticks = spark.createDataFrame(
        rows, "symbol string, price double, ts timestamp, event_id long"
    )
    kept = {r.event_id for r in session_hours_gate(ticks, cal).collect()}
    assert kept == {1, 4, 7}


def test_salted_join_keeps_null_salt_source_rows(spark):
    """A probe row whose salt-source column (event_id) is NULL must not
    vanish from the salted join — it parks in bucket 0."""
    from options_data_pipeline_spark.operators.skew import salted_join

    probe = spark.createDataFrame(
        [(None, "k1", 10), (7, "k1", 20), (8, "k2", 30)],
        "event_id long, key string, value long",
    )
    dim = spark.createDataFrame([("k1", 1), ("k2", 2)], "key string, attr long")
    out = salted_join(probe, dim, "key", buckets=4)
    plain = probe.join(dim, "key")
    assert sorted(map(tuple, out.select("key", "value", "attr").collect())) == \
        sorted(map(tuple, plain.select("key", "value", "attr").collect()))
    assert out.count() == 3

def test_parse_row_id_roundtrip_and_invalid(spark):
    """Reverse parse (reference id_generator.py:33-49): valid ids —
    including tickers containing '_' — round-trip to (symbol, ts);
    malformed ids parse to NULL/NULL (the reference's OWN
    test_invalid_id_returns_none expected None, its impl raised — we
    implement the intended contract)."""
    from options_data_pipeline_spark.operators.ids import parse_row_id

    rows = [
        ("NIFTY_20260221_0915", "NIFTY", datetime(2026, 2, 21, 9, 15)),
        ("BANK_NIFTY_20240229_1530", "BANK_NIFTY", datetime(2024, 2, 29, 15, 30)),
        ("BADID", None, None),               # reference's invalid case
        ("NIFTY_2026", None, None),           # too few parts
        ("", None, None),
        ("_20260221_0915", None, None),       # empty ticker
        ("NIFTY_20261301_0915", None, None),  # month 13
        ("NIFTY_20260221_0961", None, None),  # minute 61
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "id string")
    got = {r.id: r for r in parse_row_id(df).collect()}
    for rid, sym, ts in rows:
        assert got[rid].parsed_symbol == sym, rid
        assert got[rid].parsed_window_start == ts, rid


def test_parse_row_id_inverts_generation(spark):
    """parse ∘ generate == identity at minute grain for every candle."""
    from options_data_pipeline_spark.operators.ids import parse_row_id

    candles = spark.createDataFrame(
        [("NIFTY", datetime(2024, 1, 15, 9, 15)),
         ("BANK_NIFTY", datetime(2024, 1, 15, 10, 0))],
        "symbol string, window_start timestamp",
    )
    out = parse_row_id(with_row_id(candles)).collect()
    for r in out:
        assert r.parsed_symbol == r.symbol
        assert r.parsed_window_start == r.window_start


def test_cdc_latest_snapshot_semantics(spark):
    """Latest-wins with tombstones, on a deliberately shuffled log:
    out-of-order arrival must not matter (the pick keys on sequence,
    not input order), a delete followed by a later update RESURRECTS
    the key, a latest delete removes it, and equal timestamps break
    ties on the change id."""
    from datetime import datetime

    from options_data_pipeline_spark.operators.cdc import cdc_latest_snapshot

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    log = [
        # key 1: U(v=1) .. D .. U(v=3)  → alive at v=3 (resurrected)
        (1, t(3), 103, "U", 3.0),
        (1, t(1), 101, "U", 1.0),
        (1, t(2), 102, "D", 0.0),
        # key 2: U .. U .. D           → latest is a delete: absent
        (2, t(1), 201, "U", 1.0),
        (2, t(3), 203, "D", 0.0),
        (2, t(2), 202, "U", 2.0),
        # key 3: same ts, higher id wins
        (3, t(1), 301, "U", 1.0),
        (3, t(1), 302, "U", 2.0),
    ]
    df = spark.createDataFrame(
        log, "k bigint, ts timestamp, cid bigint, op string, v double"
    )
    snap = {
        r.k: r
        for r in cdc_latest_snapshot(
            df, key_cols=["k"], seq_cols=["ts", "cid"]
        ).collect()
    }
    assert set(snap) == {1, 3}
    assert snap[1].last_v == 3.0 and snap[1].last_cid == 103
    assert snap[1].n_changes == 3 and snap[1].n_deletes == 1
    assert snap[3].last_cid == 302 and snap[3].last_v == 2.0


def test_snapshot_diff_semantics(spark):
    """Generic diff: added / removed / changed (including NULL→value
    and value→NULL transitions, which a bare != would miss) and
    unchanged rows dropped."""
    from options_data_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        "k bigint, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),      # unchanged → absent from the diff
         (2, 21.0, "B"),      # changed value
         (3, 30.0, "C"),      # NULL → value: changed
         (5, 50.0, "E")],     # added; 4 removed
        "k bigint, v double, s string",
    )
    got = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert {k: r.status for k, r in got.items()} == {
        2: "changed", 3: "changed", 4: "removed", 5: "added"
    }
    assert got[2].old_v == 20.0 and got[2].new_v == 21.0
    assert got[3].old_v is None and got[3].new_v == 30.0
    assert got[4].new_v is None and got[5].old_v is None


def test_snapshot_diff_assert_unique(spark):
    """Opt-in precondition check: a duplicated key raises a loud
    ValueError naming the offending keys instead of silently fanning
    out through the full-outer join; the default path is unchanged."""
    import pytest

    from options_data_pipeline_spark.operators.cdc import snapshot_diff

    clean = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k bigint, v double"
    )
    duped = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0)], "k bigint, v double"
    )
    # default: no check — the fan-out is the caller's (documented) problem
    assert snapshot_diff(duped, clean, ["k"]).count() >= 1
    with pytest.raises(ValueError, match=r"old snapshot.*\bk\b"):
        snapshot_diff(duped, clean, ["k"], assert_unique=True)
    with pytest.raises(ValueError, match="new snapshot"):
        snapshot_diff(clean, duped, ["k"], assert_unique=True)
    # clean inputs pass the check and produce the normal diff
    assert snapshot_diff(clean, clean, ["k"], assert_unique=True).count() == 0
