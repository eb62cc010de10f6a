"""Range-join operator tests (operators/rangejoin.py)."""

from __future__ import annotations

from datetime import datetime

from options_data_pipeline_spark.operators.rangejoin import range_join_bucketed


def test_range_join_containment(spark):
    points = spark.createDataFrame(
        [
            (1, "A", datetime(2024, 1, 1, 10, 30)),  # inside s1
            (2, "A", datetime(2024, 1, 1, 12, 0)),   # == s1 end (exclusive) → no match
            (3, "A", datetime(2024, 1, 1, 9, 0)),    # before any
            (4, "B", datetime(2024, 1, 1, 10, 30)),  # other key
            (5, "A", datetime(2024, 1, 1, 15, 0)),   # inside s2 (bucket-crossing)
        ],
        "event_id long, symbol string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 12, 0), "s1"),
            ("A", datetime(2024, 1, 1, 14, 30), datetime(2024, 1, 1, 16, 30), "s2"),
            ("B", datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0), "s3"),
        ],
        "symbol string, session_start timestamp, session_end timestamp, name string",
    )
    out = {r.event_id: r.name for r in range_join_bucketed(points, intervals).collect()}
    assert out == {1: "s1", 4: "s3", 5: "s2"}


def test_range_join_small_buckets_still_exact(spark):
    """Bucket width much smaller than intervals: explode factor grows but
    the result is unchanged (exactness independent of bucket choice)."""
    points = spark.createDataFrame(
        [(1, "A", datetime(2024, 1, 1, 10, 59))], "event_id long, symbol string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("A", datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0), "s1")],
        "symbol string, session_start timestamp, session_end timestamp, name string",
    )
    for width in (60, 600, 86400):
        out = range_join_bucketed(points, intervals, bucket_seconds=width).collect()
        assert [r.name for r in out] == ["s1"], width
