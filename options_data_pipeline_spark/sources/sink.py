"""Batch table sinks (reference S3/S4/S11).

Reference: append-only market_data sheet, full-overwrite atr_state sheet,
and a NEW SPREADSHEET per month (``sheets_client.py:93-109``). Spark-first:
date-partitioned parquet — ``partitionBy(year, month)`` replaces the
monthly-rotation scheme and gives partition pruning on every time-ranged
read; at 100 TB add day to the partition spec and cluster/bucket by symbol
inside partitions so the per-symbol window/ATR shuffles are co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_market_data(df: DataFrame, path: str, mode: str = "append") -> None:
    """S3/S11: append fact rows partitioned by (year, month) of the window."""
    (
        df.withColumn("year", F.year("window_start"))
        .withColumn("month", F.month("window_start"))
        .write.mode(mode)
        .partitionBy("year", "month")
        .parquet(path)
    )


def read_market_data(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    return df.drop("year", "month")
