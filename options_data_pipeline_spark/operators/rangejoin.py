"""Range (interval-containment) join — the second custom operator Spark
lacks a first-class primitive for (alongside as-of, operators/asof.py).

Naive Spark turns ``t.ts BETWEEN i.start AND i.end`` into a
BroadcastNestedLoopJoin (O(rows × intervals)) or, worse, a cartesian
product when neither side broadcasts. The scale construction here is
standard bucketization:

 1. explode each interval into the fixed-width time buckets it overlaps
    (intervals are short relative to the bucket width by contract, so the
    explode factor is small);
 2. equi-join points to interval-buckets on (key, bucket) — a plain
    shuffled hash join Catalyst can plan and AQE can rebalance;
 3. re-check the exact range predicate to discard bucket-edge false hits.

Result is identical to the naive inequality join (the bucket pre-join is
a superset filter; step 3 restores exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    by: str = "symbol",
    point_ts: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point to the interval(s) containing it:
    ``start <= ts < end`` within the same ``by`` key.

    ``bucket_seconds`` trades explode factor (long intervals → more bucket
    rows) against join selectivity (wide buckets → more false hits for
    step 3). Pick ≈ the median interval length.
    """
    bucket = lambda c: (F.unix_timestamp(c) / bucket_seconds).cast("long")  # noqa: E731
    exploded = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)))),
    )
    pointed = points.withColumn("_bucket", bucket(F.col(point_ts)))
    joined = pointed.join(exploded, [by, "_bucket"], how)
    in_range = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    return joined.filter(in_range).drop("_bucket")
