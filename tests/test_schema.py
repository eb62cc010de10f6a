"""Sink-schema init/validate tests (reference S10 schema_manager intent)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from options_data_pipeline_spark.sources.schema import (
    MARKET_DATA_SCHEMA,
    initialize_if_empty,
    validate_schema,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="odp_schema_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_initialize_if_empty_then_noop(spark, tmpdir):
    path = tmpdir + "/market_data"
    assert initialize_if_empty(spark, path, "market_data") is True
    assert initialize_if_empty(spark, path, "market_data") is False
    df = spark.read.parquet(path)
    assert df.count() == 0
    assert validate_schema(df, "market_data") == []


def test_validate_schema_reports_drift(spark):
    good = spark.createDataFrame([], MARKET_DATA_SCHEMA)
    assert validate_schema(good, "market_data") == []
    bad = good.drop("atr").withColumnRenamed("tr", "true_range")
    problems = validate_schema(bad, "market_data")
    assert any("missing column atr" in p for p in problems)
    assert any("missing column tr" in p for p in problems)
    assert any("unexpected column true_range" in p for p in problems)


def test_validate_schema_catches_type_mismatch(spark):
    df = spark.createDataFrame([], MARKET_DATA_SCHEMA).withColumn(
        "tick_count", F.col("tick_count").cast("int")
    )
    problems = validate_schema(df, "market_data")
    assert any("type mismatch tick_count" in p for p in problems)
