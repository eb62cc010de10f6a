"""Scale-posture tests: salted aggregation equivalence, bucketed
no-shuffle joins."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.ohlc import ohlc_candles
from options_data_pipeline_spark.operators.skew import salted_agg, salted_ohlc
from options_data_pipeline_spark.sources.bucketed import write_bucketed, read_table
from options_data_pipeline_spark.plans.explain import count_exchanges, physical_plan


def skewed_ticks(spark, n_hot=2000, n_cold=50):
    base = datetime(2024, 1, 1, 9, 15)
    rows = []
    for i in range(n_hot):  # hot symbol
        rows.append(("HOT", float(i % 97), base + timedelta(seconds=i % 290), i))
    for i in range(n_cold):
        rows.append(("COLD", float(i), base + timedelta(seconds=i), n_hot + i))
    return spark.createDataFrame(rows, "symbol string, price double, ts timestamp, event_id long")


def test_salted_ohlc_equals_direct(spark):
    ticks = skewed_ticks(spark)
    direct = {(r.symbol, r.window_start): r for r in ohlc_candles(ticks).collect()}
    salted = {(r.symbol, r.window_start): r for r in salted_ohlc(ticks).collect()}
    assert direct.keys() == salted.keys()
    for k, d in direct.items():
        s = salted[k]
        assert (s.open, s.high, s.low, s.close, s.tick_count) == (
            d.open, d.high, d.low, d.close, d.tick_count,
        )


def test_salted_agg_equals_direct(spark):
    ticks = skewed_ticks(spark)
    direct = {
        r.symbol: r
        for r in ticks.groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("n"), F.max("price").alias("high"))
        .collect()
    }
    salted = {
        r.symbol: r
        for r in salted_agg(
            ticks,
            ["symbol"],
            {"n": (F.count(F.lit(1)), F.sum("n")), "high": (F.max("price"), F.max("high"))},
        ).collect()
    }
    for k in direct:
        assert (salted[k].n, salted[k].high) == (direct[k].n, direct[k].high)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Both sides bucketed by symbol → SortMergeJoin with zero Exchange."""
    import shutil

    for t in ("bt_a", "bt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a dropped-in-a-previous-session table leaves its warehouse dir
        # behind (in-memory catalog) — remove it or saveAsTable refuses
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    df = skewed_ticks(spark, n_hot=100, n_cold=50)
    write_bucketed(df, "bt_a", "symbol", buckets=4)
    write_bucketed(
        df.groupBy("symbol").agg(F.max("price").alias("mx")), "bt_b", "symbol", buckets=4
    )
    joined = read_table(spark, "bt_a").join(read_table(spark, "bt_b").hint("merge"), "symbol")
    plan = physical_plan(joined)
    assert count_exchanges(joined) == 0, plan
