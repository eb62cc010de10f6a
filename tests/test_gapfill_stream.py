"""Streaming gap-fill (densify stage) tests — silence within and across
micro-batch boundaries must produce chained flat candles."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest

from options_data_pipeline_spark.streaming.gapfill_stream import run_densify_stage

CANDLE_SCHEMA = (
    "symbol string, window_start timestamp, open double, high double,"
    " low double, close double, tick_count long"
)
BASE = datetime(2024, 1, 1, 9, 15)


def w(i):
    return BASE + timedelta(minutes=5 * i)


def candle(sym, i, px):
    return (sym, w(i), px, px + 1, px - 1, px + 0.5, 3)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="odp_dense_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_densify_across_batch_boundaries(spark, tmpdir):
    src, dense, ckpt = tmpdir + "/src", tmpdir + "/dense", tmpdir + "/ckpt"
    # batch 1: A in windows 0,1; B in window 0
    spark.createDataFrame(
        [candle("A", 0, 10.0), candle("A", 1, 11.0), candle("B", 0, 50.0)],
        CANDLE_SCHEMA,
    ).write.parquet(src)
    stream = spark.readStream.schema(CANDLE_SCHEMA).parquet(src)
    q = run_densify_stage(stream, dense, ckpt, 300)
    try:
        q.processAllAvailable()
        # batch 2: A in window 3 (silent in 2); B silent in 1,2,3 entirely
        spark.createDataFrame([candle("A", 3, 13.0)], CANDLE_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    out = {(r.symbol, r.window_start): r for r in spark.read.parquet(dense).collect()}
    # batch 1: B gap-filled at window 1? No — batch 1's range ends at w1 for A;
    # B's window-1 slot is inside the batch range → flat candle at B's last close
    assert out[("B", w(1))].gap_filled and out[("B", w(1))].close == 50.5
    # batch 2 range is w3 only… but the seed chain starts after each symbol's
    # last emitted window: A fills w2 flat at 11.5 then real w3
    assert out[("A", w(2))].gap_filled and out[("A", w(2))].close == 11.5
    assert not out[("A", w(3))].gap_filled
    # B silent all of batch 2: flat candles chain from its last close
    assert out[("B", w(2))].gap_filled and out[("B", w(2))].close == 50.5
    assert out[("B", w(3))].gap_filled and out[("B", w(3))].close == 50.5


def test_densify_idempotent_replay(spark, tmpdir):
    src, dense, ckpt = tmpdir + "/src", tmpdir + "/dense", tmpdir + "/ckpt"
    spark.createDataFrame(
        [candle("A", 0, 10.0), candle("A", 2, 12.0)], CANDLE_SCHEMA
    ).write.parquet(src)
    stream = spark.readStream.schema(CANDLE_SCHEMA).parquet(src)
    q = run_densify_stage(stream, dense, ckpt, 300)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(dense).count()
    assert first == 3  # w0, gap w1, w2
    # restart over the same source with a FRESH checkpoint (forced replay)
    stream2 = spark.readStream.schema(CANDLE_SCHEMA).parquet(src)
    q2 = run_densify_stage(stream2, dense, tmpdir + "/ckpt2", 300)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(dense).count() == first  # replay wrote nothing


def test_dense_sink_is_date_partitioned_and_replay_safe(spark, tmpdir):
    """The dense sink is date-partitioned (lookback prunes to partitions);
    the existence probe must see parquet under partition subdirs — a flat
    probe would skip dedup and a checkpoint-less rerun would duplicate."""
    import os

    src, dense = tmpdir + "/src", tmpdir + "/dense"
    spark.createDataFrame(
        [candle("A", 0, 10.0), candle("A", 2, 12.0)], CANDLE_SCHEMA
    ).write.parquet(src)
    from options_data_pipeline_spark.streaming.gapfill_stream import densify_batch

    batch = spark.read.parquet(src)
    first = densify_batch(batch, dense, 300, None)
    assert first == 3
    assert any(d.startswith("date=") for d in os.listdir(dense))
    # replay the identical batch with no checkpoint: anti-join must dedup
    again = densify_batch(batch, dense, 300, None)
    assert again == 0
    assert spark.read.parquet(dense).count() == 3
