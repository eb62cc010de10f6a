"""As-of join operator tests (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

from options_data_pipeline_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "A", datetime(2024, 1, 1, 10, 0)),   # exactly at right ts → inclusive
            (2, "A", datetime(2024, 1, 1, 10, 30)),  # between → 10:00 row
            (3, "A", datetime(2024, 1, 1, 9, 0)),    # before any right → NULL
            (4, "B", datetime(2024, 1, 1, 12, 0)),   # other key isolated
        ],
        "event_id long, symbol string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 10, 0), 100.0),
            ("A", datetime(2024, 1, 1, 11, 0), 110.0),
            ("B", datetime(2024, 1, 1, 10, 0), 50.0),
        ],
        "symbol string, window_start timestamp, close double",
    )
    out = {r.event_id: r for r in asof_join(left, right).collect()}
    assert out[1].asof_close == 100.0  # inclusive boundary
    assert out[2].asof_close == 100.0  # latest at-or-before
    assert out[3].asof_close is None   # no prior → left-outer NULL
    assert out[4].asof_close == 50.0   # never sees A's rows
    assert set(out[1].asDict()) == {"event_id", "symbol", "ts", "asof_close"}


def test_asof_matches_naive_inequality_join(spark):
    """Cross-validate the union-window construction against the naive
    (quadratic) inequality-join definition on pseudo-random data."""
    import random

    from pyspark.sql import functions as F
    from datetime import datetime, timedelta

    rng = random.Random(7)
    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (i, rng.choice("ABC"), base + timedelta(minutes=rng.randrange(0, 2000)))
            for i in range(120)
        ],
        "event_id long, symbol string, ts timestamp",
    )
    # unique (symbol, window_start) — duplicate as-of keys make BOTH
    # definitions tie-nondeterministic, which isn't what this test checks
    seen, rrows = set(), []
    for i in range(60):
        key = (rng.choice("ABD"), rng.randrange(0, 2000))
        if key in seen:
            continue
        seen.add(key)
        rrows.append((key[0], base + timedelta(minutes=key[1]), float(i)))
    right = spark.createDataFrame(
        rrows, "symbol string, window_start timestamp, close double"
    )
    got = {r.event_id: r.asof_close for r in asof_join(left, right).collect()}
    naive = {
        r.event_id: r.asof_close
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.symbol") == F.col("r.symbol"))
            & (F.col("r.window_start") <= F.col("l.ts")),
            "left",
        )
        .groupBy("l.event_id")
        .agg(F.max_by("r.close", "r.window_start").alias("asof_close"))
        .collect()
    }
    assert got == naive
