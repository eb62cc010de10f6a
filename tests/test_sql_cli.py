"""SQL-view surface + state-adoption tests."""

from __future__ import annotations

from datetime import datetime

from options_data_pipeline_spark.sql import create_views
from options_data_pipeline_spark.operators.joins import adopt_fresher_state

SF = "/root/testdata/sf0.001"


def test_sql_views_queryable(spark):
    names = create_views(spark, SF)
    assert "candles_5m" in names
    row = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT symbol) AS s FROM candles_5m"
    ).collect()[0]
    assert row.n > 0 and row.s == 5
    joined = spark.sql(
        """SELECT c.symbol, count(*) AS n
           FROM candles_1h c JOIN enriched_1h e USING (symbol, window_start)
           GROUP BY c.symbol"""
    ).collect()
    assert len(joined) == 5
    m = spark.sql(
        "SELECT count(*) AS n, count(macd_signal) AS with_sig FROM macd_1h"
    ).collect()[0]
    assert m.n > 0 and 0 < m.with_sig < m.n  # warmup NULLs then signal


def test_sql_view_filter_pushdown(spark):
    from options_data_pipeline_spark.plans.explain import pushed_filters

    create_views(spark, SF)
    df = spark.sql("SELECT * FROM ticks WHERE symbol = 'click'")
    assert "event_type" in pushed_filters(df)  # view filter reaches the scan


def test_adopt_fresher_state(spark):
    t1, t2 = datetime(2024, 1, 1, 10), datetime(2024, 1, 1, 11)
    local = spark.createDataFrame(
        [("A", 1.0, t2), ("B", 2.0, t1), ("C", 3.0, t1)],
        "symbol string, last_close double, last_window_start timestamp",
    )
    remote = spark.createDataFrame(
        [("A", 10.0, t1), ("B", 20.0, t2), ("D", 40.0, t1)],
        "symbol string, last_close double, last_window_start timestamp",
    )
    out = {r.symbol: r for r in adopt_fresher_state(local, remote).collect()}
    assert out["A"].source == "local" and out["A"].last_close == 1.0   # C: local ahead
    assert out["B"].source == "remote" and out["B"].last_close == 20.0  # D: remote ahead
    assert out["C"].source == "local"   # A: remote missing
    assert out["D"].source == "remote"  # only remote has it


def test_round4_views_queryable(spark):
    names = create_views(spark, SF)
    assert "indicators_1h" in names and "doc_signals" in names
    r = spark.sql(
        """SELECT count(*) AS n,
                  count(CASE WHEN bb_mid IS NOT NULL THEN 1 END) AS warm
           FROM indicators_1h"""
    ).collect()[0]
    assert r.n > 0 and 0 < r.warm < r.n  # warmup nulls present, then bands
    d = spark.sql(
        "SELECT count(*) AS n FROM doc_signals WHERE quality_score IS NOT NULL"
    ).collect()[0]
    assert d.n == 500
