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


def test_asof_nearest_direction_tolerance_and_ties(spark):
    """nearest picks the closer side, ties go to the EARLIER right row,
    and rows with nothing inside the tolerance get NULLs."""
    from datetime import datetime

    from options_data_pipeline_spark.operators.asof import asof_nearest

    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, "A", t(10), 1.0),   # right at 10:00 (d=600) and 10:15 (d=300) → forward
            (2, "A", t(2), 2.0),    # right at 10:00 (d=120) closer than 10:15 → backward
            (3, "A", t(55), 3.0),   # nearest is 10:15 at d=2400 > tol → NULL
            (4, "B", t(30), 4.0),   # no right rows for B at all → NULL
        ],
        "event_id long, symbol string, ts timestamp, price double",
    )
    right = spark.createDataFrame(
        [("A", t(0), 100.0), ("A", t(15), 115.0)],
        "symbol string, window_start timestamp, close double",
    )
    out = {
        r.event_id: r
        for r in asof_nearest(
            left, right, value_cols=("close",), tolerance_s=600.0
        ).collect()
    }
    assert out[1].nearest_close == 115.0 and out[1].nearest_ts == t(15)
    assert out[2].nearest_close == 100.0
    assert out[3].nearest_close is None and out[3].nearest_ts is None
    assert out[4].nearest_close is None

    # exact tie: left at 10:10 with rights at 10:05 / 10:15 → earlier wins
    tie = spark.createDataFrame(
        [(9, "A", t(10), 1.0)],
        "event_id long, symbol string, ts timestamp, price double",
    )
    right2 = spark.createDataFrame(
        [("A", t(5), 105.0), ("A", t(15), 115.0)],
        "symbol string, window_start timestamp, close double",
    )
    got = asof_nearest(tie, right2, value_cols=("close",), tolerance_s=600.0).collect()[0]
    assert got.nearest_close == 105.0  # backward on tie

def test_asof_null_value_column_stays_null(spark):
    """A NULL value column in the MATCHED right row must come through as
    NULL — not be back-filled from a farther right row (the right row is
    picked atomically as a struct). Covers asof_join and asof_nearest."""
    from datetime import datetime

    from options_data_pipeline_spark.operators.asof import asof_join, asof_nearest

    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "A", t(12))], "event_id long, symbol string, ts timestamp"
    )
    # latest/nearest right row (10:10) has close=NULL, volume=7;
    # the farther row (10:00) has close=99 — 99 must NOT leak in.
    right = spark.createDataFrame(
        [("A", t(0), 99.0, 3), ("A", t(10), None, 7)],
        "symbol string, window_start timestamp, close double, volume long",
    )
    j = asof_join(left, right, value_cols=("close", "volume")).collect()[0]
    assert j.asof_close is None and j.asof_volume == 7

    n = asof_nearest(
        left, right, value_cols=("close", "volume"), tolerance_s=600.0
    ).collect()[0]
    assert n.nearest_ts == t(10)
    assert n.nearest_close is None and n.nearest_volume == 7
