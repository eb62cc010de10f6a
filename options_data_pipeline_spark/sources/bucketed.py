"""Bucketed tables for shuffle-free co-located joins (100 TB posture).

At scale, the repeated join/agg key is ``symbol`` (dedup reads, state
reconciliation, candle↔candle joins across days). Writing both sides
``bucketBy(n, symbol)`` lets Catalyst plan a SortMergeJoin with NO
Exchange on either side — the bucket files are the shuffle, paid once at
write time. This module wraps the write/read pair; the no-shuffle
property is pinned by a plan test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "symbol",
    buckets: int = 8,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
