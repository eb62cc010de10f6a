"""Property-based tests (hypothesis): OHLC invariants and ATR behavior
over arbitrary tick/TR series — beyond the reference's example-based
suite."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings, strategies as st

from options_data_pipeline_spark.operators.atr import _wilder
from options_data_pipeline_spark.operators.ohlc import ohlc_candles

prices = st.lists(
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)


@settings(max_examples=20, deadline=None)
@given(prices)
def test_ohlc_invariants_hold_for_any_series(spark_prop, ps):
    base = datetime(2024, 1, 1, 9, 15)
    rows = [("A", p, base + timedelta(seconds=i % 290), i) for i, p in enumerate(ps)]
    df = spark_prop.createDataFrame(rows, "symbol string, price double, ts timestamp, event_id long")
    [c] = ohlc_candles(df).collect()
    assert c.high == max(ps) and c.low == min(ps)
    assert c.open == ps[0] and c.close == ps[-1]  # arrival order
    assert c.high >= max(c.open, c.close) and c.low <= min(c.open, c.close)
    assert c.tick_count == len(ps)


trs = st.lists(
    st.floats(min_value=0.0, max_value=1e5, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(trs)
def test_wilder_atr_properties(ts):
    out = _wilder(ts, 14)
    assert len(out) == len(ts)
    # warmup: exactly min(len, 13) leading Nones
    n_none = sum(1 for v in out if v is None)
    assert n_none == min(len(ts), 13)
    # ATR never negative, and never exceeds the running max TR
    seen = [v for v in out if v is not None]
    if seen:
        assert all(v >= 0 for v in seen)
        assert max(seen) <= max(ts) + 1e-9
    # smoothing bound: each step moves ATR toward TR by at most 1/14
    for i in range(14, len(ts)):
        if out[i - 1] is not None and out[i] is not None:
            expected = (out[i - 1] * 13 + ts[i]) / 14
            assert out[i] == pytest.approx(max(expected, 0.0))


sigs32 = st.lists(
    st.integers(min_value=0, max_value=(1 << 32) - 1), min_size=2, max_size=12, unique=True
)


@settings(max_examples=10, deadline=None)
@given(sigs32)
def test_simhash_banding_equals_naive_for_any_signatures(spark_prop, sig_values):
    """Pigeonhole banding is EXACT: for arbitrary 32-bit signatures the
    banded pairing equals the naive quadratic Hamming join."""
    from options_data_pipeline_spark.functions.dedupe import (
        simhash_pairs_from_signatures,
    )

    rows = list(enumerate(sig_values))
    df = spark_prop.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs_from_signatures(df, max_hamming=3).collect()
    }
    want = {
        (a, b, bin(sa ^ sb).count("1"))
        for a, sa in rows
        for b, sb in rows
        if a < b and bin(sa ^ sb).count("1") <= 3
    }
    assert got == want


texts = st.text(alphabet="abcdefgh ", min_size=0, max_size=60)
shared_passages = st.text(alphabet="qrstuvwxyz", min_size=19, max_size=40)


@settings(max_examples=10, deadline=None)
@given(texts, texts, shared_passages)
def test_winnowing_guarantee_for_any_shared_passage(spark_prop, pre, post, shared):
    """Any two docs embedding the same ≥ k+w-1 (=19) char passage share a
    winnowing fingerprint, wherever the passage sits in either doc."""
    from options_data_pipeline_spark.functions.text import winnow_fingerprints

    df = spark_prop.createDataFrame(
        [(0, f"{pre} {shared} {post}"), (1, f"{post} {shared} {pre}")],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(df, k=12, w=8).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[0] & fps[1]


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark
