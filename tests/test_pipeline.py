"""End-to-end pipeline tests (reference main.py orchestration §3.1)."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest

from options_data_pipeline_spark.pipeline import run_batch, run_streaming

TICK_SCHEMA = "symbol string, price double, ts timestamp, event_id long"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="odp_pipe_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def session_ticks(spark, day=datetime(2024, 1, 5)):
    base = day.replace(hour=9, minute=15)
    rows, eid = [], 0
    for w in range(4):
        for sym, sec, px in [("A", 10, 100.0), ("A", 120, 101.0), ("B", 30, 50.0)]:
            rows.append((sym, px + w, base + timedelta(minutes=5 * w, seconds=sec), eid))
            eid += 1
    # out-of-session noise that must be filtered (pre-open + post-close)
    rows.append(("A", 999.0, day.replace(hour=8, minute=0), eid)); eid += 1
    rows.append(("A", 999.0, day.replace(hour=16, minute=0), eid))
    return spark.createDataFrame(rows, TICK_SCHEMA)


def test_batch_pipeline_end_to_end(spark, tmpdir):
    sink, state = tmpdir + "/market", tmpdir + "/state"
    n = run_batch(session_ticks(spark), sink, state_path=state)
    assert n == 8  # 2 symbols × 4 windows; 999s filtered by session gate
    fact = spark.read.parquet(sink)
    assert fact.filter("open = 999.0").count() == 0
    assert set(fact.columns) >= {"symbol", "window_start", "open", "close", "tr", "atr", "id", "gap_filled"}
    st = spark.read.parquet(state)
    assert {r.symbol for r in st.collect()} == {"A", "B"}
    [a] = st.filter("symbol = 'A'").collect()
    assert a.last_close == 104.0 and a.candle_count == 4


def test_batch_pipeline_idempotent_rerun(spark, tmpdir):
    sink = tmpdir + "/market"
    ticks = session_ticks(spark)
    assert run_batch(ticks, sink) == 8
    assert run_batch(ticks, sink) == 0  # replay writes nothing
    assert spark.read.parquet(sink).count() == 8


def test_batch_pipeline_special_session_calendar(spark, tmpdir):
    """run_batch with a load_calendar-shaped frame (session columns) keeps
    a Muhurat-style evening session on a holiday and drops the holiday's
    default-hours ticks — the end-to-end wiring of session_hours_gate."""
    import json

    from options_data_pipeline_spark.sources.json_source import load_calendar

    day = datetime(2024, 1, 5)  # a Friday
    rows = [
        ("A", 100.0, day.replace(hour=18, minute=30), 1),  # special window → kept
        ("A", 101.0, day.replace(hour=18, minute=32), 2),  # special window → kept
        ("A", 999.0, day.replace(hour=10, minute=0), 3),   # holiday default hours → dropped
    ]
    ticks = spark.createDataFrame(rows, TICK_SCHEMA)
    cal_path = tmpdir + "/cal.json"
    with open(cal_path, "w") as f:
        json.dump(
            {
                "holidays": [{"date": "2024-01-05", "name": "Diwali"}],
                "special_sessions": {
                    "2024-01-05": {"name": "Muhurat", "open": "18:15", "close": "19:45"}
                },
            },
            f,
        )
    cal = load_calendar(spark, cal_path)
    sink = tmpdir + "/market"
    assert run_batch(ticks, sink, calendar=cal) == 1  # one 5-min window kept
    fact = spark.read.parquet(sink)
    [row] = fact.collect()
    assert row.open == 100.0 and row.close == 101.0
    assert fact.filter("open = 999.0").count() == 0


def test_streaming_pipeline_end_to_end(spark, tmpdir):
    src, candles, sink, ckpt = (
        tmpdir + "/src", tmpdir + "/candles", tmpdir + "/sink", tmpdir + "/ckpt"
    )
    ticks = session_ticks(spark).filter("price < 900")
    ticks.write.parquet(src)
    stream = spark.readStream.schema(TICK_SCHEMA).parquet(src)
    q1, q2 = run_streaming(stream, candles, sink, ckpt)
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()
    fact = spark.read.parquet(sink)
    # append mode: all but the last (still-open) window are written
    assert fact.count() == 6
    assert set(fact.columns) >= {"symbol", "window_start", "tr", "atr", "id"}


def test_streaming_pipeline_with_gap_fill(spark, tmpdir):
    """Full 3-stage streaming pipeline: a symbol silent for one window
    gets a flat candle which then flows through the stateful ATR stage."""
    src = tmpdir + "/src"
    base = datetime(2024, 1, 5, 9, 15)
    rows = [
        ("A", 100.0, base + timedelta(seconds=10), 1),
        ("B", 50.0, base + timedelta(seconds=20), 2),
        ("A", 101.0, base + timedelta(minutes=5, seconds=10), 3),  # B silent in w1
        ("A", 102.0, base + timedelta(minutes=10, seconds=10), 4),
        ("B", 51.0, base + timedelta(minutes=10, seconds=20), 5),
        ("A", 103.0, base + timedelta(minutes=15, seconds=10), 6),  # w3 stays open
    ]
    spark.createDataFrame(rows, TICK_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(TICK_SCHEMA).parquet(src)
    queries = run_streaming(
        stream,
        tmpdir + "/candles",
        tmpdir + "/sink",
        tmpdir + "/ckpt",
        dense_path=tmpdir + "/dense",
    )
    try:
        for q in queries:
            q.processAllAvailable()
        # one extra drain so downstream stages see upstream's last writes
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()
    fact = {(r.symbol, r.window_start): r for r in spark.read.parquet(tmpdir + "/sink").collect()}
    w1 = base + timedelta(minutes=5)
    gap = fact[("B", w1)]
    assert gap.gap_filled and gap.close == 50.0 and gap.tick_count == 0
    assert gap.tr is not None  # the flat candle went through the ATR stage
    assert not fact[("A", w1)].gap_filled
