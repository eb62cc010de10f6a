"""OHLC aggregation tests — mirrors the reference's test_tick_buffer.py /
test_time_utils.py intent (SURVEY.md §5: single/multi-tick accumulation,
boundary assignment, pre/post-market rejection)."""

from __future__ import annotations

from datetime import datetime

from options_data_pipeline_spark.operators.ohlc import ohlc_candles
from options_data_pipeline_spark.operators.filters import in_session
from options_data_pipeline_spark.operators.queries import validate_ohlc


def ticks_df(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, price double, ts timestamp, event_id long"
    )


def test_single_tick_ohlc(spark):
    df = ticks_df(spark, [("A", 100.0, datetime(2024, 1, 1, 9, 17), 1)])
    [c] = ohlc_candles(df).collect()
    assert (c.open, c.high, c.low, c.close, c.tick_count) == (100.0, 100.0, 100.0, 100.0, 1)
    assert c.window_start == datetime(2024, 1, 1, 9, 15)


def test_multi_tick_accumulation(spark):
    rows = [
        ("A", 100.0, datetime(2024, 1, 1, 9, 15, 1), 1),
        ("A", 105.0, datetime(2024, 1, 1, 9, 15, 2), 2),
        ("A", 95.0, datetime(2024, 1, 1, 9, 16, 0), 3),
        ("A", 102.0, datetime(2024, 1, 1, 9, 19, 59), 4),
    ]
    [c] = ohlc_candles(ticks_df(spark, rows)).collect()
    assert (c.open, c.high, c.low, c.close, c.tick_count) == (100.0, 105.0, 95.0, 102.0, 4)


def test_arrival_order_tie_break(spark):
    """Two ticks with the SAME timestamp: first/last resolved by event_id
    (reference arrival order, SURVEY §7 risk 2)."""
    t = datetime(2024, 1, 1, 9, 15, 0)
    rows = [("A", 200.0, t, 2), ("A", 100.0, t, 1)]
    [c] = ohlc_candles(ticks_df(spark, rows)).collect()
    assert c.open == 100.0 and c.close == 200.0


def test_boundary_tick_belongs_to_new_window(spark):
    """Tick at exactly 09:20:00.000 → window 09:20 (reference
    time_utils.py:174-177)."""
    rows = [
        ("A", 1.0, datetime(2024, 1, 1, 9, 19, 59, 999999), 1),
        ("A", 2.0, datetime(2024, 1, 1, 9, 20, 0), 2),
    ]
    out = {r.window_start: r for r in ohlc_candles(ticks_df(spark, rows)).collect()}
    assert out[datetime(2024, 1, 1, 9, 15)].close == 1.0
    assert out[datetime(2024, 1, 1, 9, 20)].open == 2.0


def test_session_filter_rejects_pre_open_and_post_close(spark):
    """08:00 rejected (pre-open), 15:30:01 rejected (post-close), 09:15:00
    kept (inclusive open), 15:29:59 kept (exclusive close) — reference
    test_results.txt time_utils cases."""
    rows = [
        ("A", 1.0, datetime(2024, 1, 1, 8, 0), 1),
        ("A", 2.0, datetime(2024, 1, 1, 9, 15, 0), 2),
        ("A", 3.0, datetime(2024, 1, 1, 15, 29, 59), 3),
        ("A", 4.0, datetime(2024, 1, 1, 15, 30, 1), 4),
        ("A", 5.0, datetime(2024, 1, 1, 15, 30, 0), 5),
    ]
    kept = in_session(ticks_df(spark, rows)).select("event_id").collect()
    assert sorted(r.event_id for r in kept) == [2, 3]


def test_ohlc_invariants_hold_on_real_data(spark):
    rows = [
        ("A", float(p), datetime(2024, 1, 1, 9, 15, s), i)
        for i, (p, s) in enumerate([(10, 1), (20, 2), (5, 3), (15, 4)])
    ]
    candles = ohlc_candles(ticks_df(spark, rows))
    assert validate_ohlc(candles).count() == 0


def test_sliding_ohlc_each_tick_in_two_windows(spark):
    """10m/5m hopping windows: a tick at 09:17 belongs to the windows
    starting 09:10 and 09:15; per-window OHLC matches the tick subsets."""
    from datetime import datetime

    from options_data_pipeline_spark.operators.ohlc import sliding_ohlc

    rows = [
        ("A", 10.0, datetime(2024, 1, 1, 9, 17), 1, 1),
        ("A", 12.0, datetime(2024, 1, 1, 9, 21), 2, 1),  # 09:15 + 09:20 windows
    ]
    ticks = spark.createDataFrame(
        rows, "symbol string, price double, ts timestamp, event_id long, user_id long"
    )
    out = {
        r.window_start: r for r in sliding_ohlc(ticks, "10 minutes", "5 minutes").collect()
    }
    assert len(out) == 3  # 09:10 (tick1), 09:15 (both), 09:20 (tick2)
    w1510 = out[datetime(2024, 1, 1, 9, 10)]
    w1515 = out[datetime(2024, 1, 1, 9, 15)]
    w1520 = out[datetime(2024, 1, 1, 9, 20)]
    assert (w1510.open, w1510.close, w1510.tick_count) == (10.0, 10.0, 1)
    assert (w1515.open, w1515.close, w1515.high, w1515.tick_count) == (10.0, 12.0, 12.0, 2)
    assert (w1520.open, w1520.tick_count) == (12.0, 1)
    assert w1515.window_end == datetime(2024, 1, 1, 9, 25)


def test_resample_candles_1h_rollup(spark):
    """5m → 1h roll-up: open/close from first/last child window, high/low/
    tick_count aggregated."""
    from datetime import datetime, timedelta

    from options_data_pipeline_spark.operators.ohlc import resample_candles

    base = datetime(2024, 1, 1, 9, 0)
    rows = [
        ("A", base + timedelta(minutes=5 * i), 10.0 + i, 20.0 + i, 5.0 + i, 15.0 + i, 2)
        for i in range(15)  # 12 candles in hour 1, 3 in hour 2
    ]
    candles = spark.createDataFrame(
        rows,
        "symbol string, window_start timestamp, open double, high double,"
        " low double, close double, tick_count long",
    )
    out = {r.window_start: r for r in resample_candles(candles, "1 hour").collect()}
    h1, h2 = out[base], out[base + timedelta(hours=1)]
    assert (h1.open, h1.close) == (10.0, 15.0 + 11)  # first open, last close
    assert (h1.high, h1.low, h1.tick_count) == (20.0 + 11, 5.0, 24)
    assert (h2.open, h2.close, h2.tick_count) == (10.0 + 12, 15.0 + 14, 6)


def test_donchian_and_sma_warmup_and_values(spark):
    """Indicators: NULL during warmup; after it, channel = rolling 20
    max/min and position reflects the close; SMA equals the arithmetic
    mean of the window."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    from options_data_pipeline_spark.operators.indicators import donchian_channels, sma

    base = datetime(2024, 1, 1, 9, 0)
    rows = [
        ("A", base + timedelta(hours=i), 10.0, 10.0 + i, 5.0, 7.0 + (i % 3), 1)
        for i in range(25)
    ]
    candles = spark.createDataFrame(
        rows,
        "symbol string, window_start timestamp, open double, high double,"
        " low double, close double, tick_count long",
    )
    dc = sorted(donchian_channels(candles, 20).collect(), key=lambda r: r.window_start)
    assert all(r.dc_upper is None for r in dc[:19])  # warmup
    r20 = dc[19]
    assert (r20.dc_upper, r20.dc_lower) == (10.0 + 19, 5.0)
    assert r20.dc_pos == _pytest.approx((r20.close - 5.0) / (29.0 - 5.0))
    sm = sorted(sma(candles, 20).collect(), key=lambda r: r.window_start)
    assert all(r.sma_20 is None for r in sm[:19])
    want = sum(7.0 + (i % 3) for i in range(20)) / 20
    assert sm[19].sma_20 == _pytest.approx(want, abs=1e-9)


def test_stochastic_and_obv_hand_computed(spark):
    """Stochastic: NULL %K through warmup, then picks/division against
    the rolling extremes; %D appears after 3 full %Ks and equals their
    mean. OBV: signed running tick_count sum, first candle contributes
    0, exact integers."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    from options_data_pipeline_spark.operators.indicators import (
        obv,
        stochastic_oscillator,
    )

    base = datetime(2024, 1, 1, 9, 0)
    rows = [
        ("A", base + timedelta(hours=i), 10.0, 10.0 + i, 5.0, 7.0 + (i % 3), 2 + i)
        for i in range(18)
    ]
    candles = spark.createDataFrame(
        rows,
        "symbol string, window_start timestamp, open double, high double,"
        " low double, close double, tick_count long",
    )
    st = sorted(
        stochastic_oscillator(candles, 14).collect(), key=lambda r: r.window_start
    )
    assert all(r.pct_k is None for r in st[:13])  # warmup
    # row 13 (14th candle): hi = max(10..23) = 23, lo = 5, close = 7+13%3=8
    assert st[13].pct_k == _pytest.approx(100.0 * (8.0 - 5.0) / (23.0 - 5.0))
    assert st[13].pct_d is None and st[14].pct_d is None  # needs 3 full %Ks
    want_d = (st[15].pct_k + st[14].pct_k + st[13].pct_k) / 3.0
    assert st[15].pct_d == _pytest.approx(want_d, abs=1e-12)

    ob = sorted(obv(candles).collect(), key=lambda r: r.window_start)
    # closes cycle 7,8,9,7,8,9..: up, up, down(-), up, up, down...
    assert ob[0].obv == 0  # no prev close
    assert ob[1].obv == ob[1].volume  # 8 > 7: +vol
    assert ob[2].obv == ob[1].obv + ob[2].volume  # 9 > 8
    assert ob[3].obv == ob[2].obv - ob[3].volume  # 7 < 9
    running = 0
    prev_close = None
    for r in ob:
        if prev_close is not None:
            running += r.volume if r.close > prev_close else (-r.volume if r.close < prev_close else 0)
        prev_close = r.close
        assert r.obv == running


def test_keltner_and_heikin_ashi_hand_computed(spark):
    """Keltner: bands NULL until both recursions seed (max(20,10) rows);
    then upper−mid == mid−lower == 2×ATR and mid equals the EMA of the
    typical price (checked against an in-test pure-Python fold).
    Heikin-Ashi: first two rows hand-computed."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    from options_data_pipeline_spark.operators.indicators import (
        heikin_ashi,
        keltner_channels,
    )

    base = datetime(2024, 1, 1, 9, 0)
    rows = [
        ("A", base + timedelta(hours=i), 9.0 + (i % 4), 10.0 + i, 5.0, 7.0 + (i % 3), 1)
        for i in range(25)
    ]
    candles = spark.createDataFrame(
        rows,
        "symbol string, window_start timestamp, open double, high double,"
        " low double, close double, tick_count long",
    )
    kc = sorted(keltner_channels(candles).collect(), key=lambda r: r.window_start)
    assert all(r.kc_mid is None for r in kc[:19])  # EMA20 seeds last
    assert kc[19].kc_mid is not None and kc[19].kc_upper is not None
    # mirror fold in pure python
    h = [10.0 + i for i in range(25)]
    l = [5.0] * 25
    c = [7.0 + (i % 3) for i in range(25)]
    typ = [((h[i] + l[i]) + c[i]) / 3.0 for i in range(25)]
    e = sum(typ[:20]) / 20
    tr = [h[0] - l[0]] + [
        max(h[i] - l[i], abs(h[i] - c[i - 1]), abs(l[i] - c[i - 1]))
        for i in range(1, 25)
    ]
    a = sum(tr[:10]) / 10
    for i in range(10, 20):
        a = (a * 9 + tr[i]) / 10
    assert kc[19].kc_mid == _pytest.approx(e, abs=1e-12)
    assert kc[19].kc_upper == _pytest.approx(e + 2.0 * a, abs=1e-12)
    assert kc[19].kc_lower == _pytest.approx(e - 2.0 * a, abs=1e-12)

    ha = sorted(heikin_ashi(candles).collect(), key=lambda r: r.window_start)
    o0, h0, l0, c0 = 9.0, 10.0, 5.0, 7.0
    hc0 = (((o0 + h0) + l0) + c0) / 4.0
    ho0 = (o0 + c0) / 2.0
    assert ha[0].ha_close == _pytest.approx(hc0, abs=0)
    assert ha[0].ha_open == _pytest.approx(ho0, abs=0)
    assert ha[0].ha_high == max(h0, ho0, hc0)
    o1, h1, l1, c1 = 10.0, 11.0, 5.0, 8.0
    assert ha[1].ha_open == _pytest.approx((ho0 + hc0) / 2.0, abs=0)
    assert ha[1].ha_close == _pytest.approx((((o1 + h1) + l1) + c1) / 4.0, abs=0)


def test_adx_direction_and_flat_guards(spark):
    """ADX: a steadily-rising symbol has DI+ > DI− once defined and a
    high ADX after its warmup; a perfectly flat symbol hits the zero
    guards (DI = DX = 0, ADX = 0 — defined, not NaN). Warmups: DI/DX
    NULL before rn=14, ADX NULL before rn=27."""
    from datetime import datetime, timedelta

    from options_data_pipeline_spark.operators.indicators import adx

    base = datetime(2024, 1, 1, 9, 0)
    rows = [
        ("UP", base + timedelta(hours=i), 10.0 + i, 11.0 + i, 9.0 + i, 10.5 + i, 1)
        for i in range(30)
    ] + [
        ("FLAT", base + timedelta(hours=i), 10.0, 11.0, 9.0, 10.0, 1)
        for i in range(30)
    ]
    candles = spark.createDataFrame(
        rows,
        "symbol string, window_start timestamp, open double, high double,"
        " low double, close double, tick_count long",
    )
    out = {
        (r.symbol, i): r
        for sym in ("UP", "FLAT")
        for i, r in enumerate(
            sorted(
                [r for r in adx(candles).collect() if r.symbol == sym],
                key=lambda r: r.window_start,
            )
        )
    }
    assert out[("UP", 12)].di_plus is None and out[("UP", 13)].di_plus is not None
    assert out[("UP", 25)].adx is None and out[("UP", 26)].adx is not None
    assert out[("UP", 29)].di_plus > out[("UP", 29)].di_minus
    assert out[("UP", 29)].adx > 50.0  # pure trend
    f = out[("FLAT", 29)]
    assert (f.di_plus, f.di_minus, f.dx, f.adx) == (0.0, 0.0, 0.0, 0.0)
