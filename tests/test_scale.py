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


def test_dynamic_partition_pruning_on_partitioned_sink(spark, tmp_path):
    """DPP — the partition-pruning that matters at 100 TB: joining the
    (year, month)-partitioned candle sink against a FILTERED dim must
    inject a dynamic pruning predicate into the fact scan's partition
    filters (only matching month directories are listed/read), not scan
    all partitions and filter post-join."""
    from options_data_pipeline_spark.sources.sink import write_market_data

    rows = [
        ("A", datetime(2024, m, 15, 9, 15), float(m)) for m in (1, 2, 3)
        for _ in range(4)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, window_start timestamp, close double"
    )
    path = str(tmp_path / "sink")
    write_market_data(df, path)
    fact = spark.read.parquet(path)
    # DPP's planner rule wants a SELECTIVE predicate on the build side —
    # a bare literal table doesn't qualify; a filtered dim does
    dim = spark.createDataFrame(
        [(2024, m, "keep" if m == 2 else "drop") for m in (1, 2, 3)],
        "year int, month int, tag string",
    ).filter(F.col("tag") == "keep")
    out = fact.join(F.broadcast(dim), ["year", "month"])
    plan = physical_plan(out)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = out.collect()
    assert len(got) == 4 and all(r.month == 2 for r in got)
