"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (5-minute tumbling OHLC + True
Range over the events tick-stream proxy — reference operators A1+W1+W5) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator
registry (SURVEY.md §2 + §2.10 extensions) with DuckDB oracle twins; see
options_data_pipeline_spark/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from options_data_pipeline_spark import registry
from options_data_pipeline_spark.operators.ohlc import ohlc_candles
from options_data_pipeline_spark.operators.truerange import with_true_range
from options_data_pipeline_spark.sources.tables import load_ticks


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 5-min OHLC + TR on /root/testdata/sf0.001 events."""
    ticks = load_ticks(spark, "/root/testdata/sf0.001")
    return with_true_range(ohlc_candles(ticks, "300 seconds"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
