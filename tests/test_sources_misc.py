"""CSV scrip-master scan, JSON calendar, partitioned sink, multimodal
plumbing, and AlertManager tests."""

from __future__ import annotations

import json
import shutil
import tempfile
from datetime import datetime

import pytest

from options_data_pipeline_spark.sources.csv_source import read_scrip_master, match_tokens
from options_data_pipeline_spark.sources.json_source import load_calendar
from options_data_pipeline_spark.sources.sink import write_market_data, read_market_data
from options_data_pipeline_spark.functions.multimodal import extract_features, sample_frames, MEDIA_SCHEMA
from options_data_pipeline_spark.streaming.listeners import AlertManager


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="odp_misc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_scrip_master_column_inference_and_match(spark, tmpdir):
    path = tmpdir + "/scrip.csv"
    with open(path, "w") as f:
        f.write("pSymbol,pSymbolName,pExchSeg,extra\n")
        f.write("11536,TCS,nse_cm,x\n")
        f.write("99999,TCS,nse_cm,dup\n")  # duplicate symbol — first (min token) wins
        f.write("2885,RELIANCE,nse_cm,y\n")
        f.write("123,OTHER,nse_cm,z\n")
    dim = read_scrip_master(spark, path)
    out = {r.symbol: r.token for r in match_tokens(dim, ["tcs", "RELIANCE"]).collect()}
    assert out == {"TCS": "11536", "RELIANCE": "2885"}


def test_calendar_json(spark, tmpdir):
    path = tmpdir + "/cal.json"
    doc = {
        "holidays": [{"date": "2026-01-26", "name": "Republic Day"}, "2026-03-14"],
        "special_sessions": {
            "2026-11-10": {"name": "Muhurat", "open": "18:15", "close": "19:45"}
        },
    }
    json.dump(doc, open(path, "w"))
    cal = {r.date.isoformat(): r for r in load_calendar(spark, path).collect()}
    assert cal["2026-01-26"].is_holiday and cal["2026-01-26"].holiday_name == "Republic Day"
    assert cal["2026-03-14"].is_holiday
    mu = cal["2026-11-10"]
    assert not mu.is_holiday and (mu.session_open, mu.session_close) == ("18:15", "19:45")


def test_partitioned_market_data_sink(spark, tmpdir):
    path = tmpdir + "/market"
    df = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 15, 9, 15), 1.0),
            ("A", datetime(2024, 2, 1, 9, 15), 2.0),
        ],
        "symbol string, window_start timestamp, close double",
    )
    write_market_data(df, path)
    back = read_market_data(spark, path)
    assert back.count() == 2
    # partition pruning: a month-filtered read should scan one partition
    pruned = spark.read.parquet(path).filter("year = 2024 AND month = 1")
    assert pruned.count() == 1


def test_multimodal_feature_extract(spark):
    rows = [
        (1, "fake", bytearray(b"\x00\x20\x40\xff"), ("raw", 2, 2, None)),
        (2, "fake", bytearray(b""), ("raw", 0, 0, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(media, decoder="fake").collect()}
    assert out[1].n_bytes == 4 and len(out[1].feature) == 8
    assert out[1].feature[0] == pytest.approx(0.25)  # one byte in bucket 0
    assert out[1].feature[7] == pytest.approx(0.25)  # 0xff in bucket 7
    assert out[2].n_bytes == 0


def test_multimodal_real_codec_is_stubbed(spark):
    media = spark.createDataFrame([(1, "image", bytearray(b"xx"), ("png", 1, 1, None))], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, decoder="image").collect()


def test_frame_sampling(spark):
    media = spark.createDataFrame(
        [(1, "video", bytearray(b""), ("mp4", 0, 0, 3500))], MEDIA_SCHEMA
    )
    frames = sample_frames(media, 1000).collect()
    assert [f.offset_ms for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 1000, 2000]


def test_alert_manager_escalation():
    am = AlertManager(escalate_after=3)
    levels = [am.fire("WARNING", "RECONNECT")["level"] for _ in range(4)]
    assert levels == ["WARNING", "WARNING", "CRITICAL", "CRITICAL"]
    am.resolve("RECONNECT")
    assert am.fire("WARNING", "RECONNECT")["level"] == "WARNING"
    # dual channel: all five + one post-resolve events recorded
    assert len(am.events) == 5
