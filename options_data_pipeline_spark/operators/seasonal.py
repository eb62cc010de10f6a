"""Seasonal hour-of-day baseline scoring, shared by the batch registry
query (``seasonal_hour_anomaly``) and the streaming twin
(streaming/seasonal_stream.py): the cell build and the leave-one-out
z-score are ONE implementation, so batch/stream parity is structural.

Cells are (event_type, day_start, hour_of_day) counts; scores compare
each cell to the SAME hour on every OTHER observed day via
leave-one-out mean/std derived from the cell group's exact integer
sum / sum-of-squares — a mirrored chain of exactly-rounded IEEE ops,
bit-identical to the DuckDB oracle without any grid."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: minimum observed days at an hour-of-day before a baseline is trusted
MIN_BASELINE_DAYS = 8


def hour_cells(events: DataFrame) -> DataFrame:
    """(event_type, day_start, hour_of_day, n_events) counts — the
    associative partial every slice of events (a batch table or one
    micro-batch) reduces to; cells from disjoint slices merge by
    summing n_events."""
    return (
        events.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day_start"),
            F.hour("ts").alias("hour_of_day"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def loo_scores(cells: DataFrame) -> DataFrame:
    """Leave-one-out seasonal z-scores over an hour-cell table (see
    module docstring). One window at (event_type, hour_of_day) grain —
    day-grain rows, never event grain."""
    w = Window.partitionBy("event_type", "hour_of_day")
    n = F.col("n_events")
    st = cells.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_days"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(n * n).over(w).alias("q"),
    )
    m = F.when(
        F.col("n_days") >= MIN_BASELINE_DAYS,
        (F.col("s") - n) / (F.col("n_days") - 1),
    )
    calc = st.withColumn("m", m)
    sd = F.when(
        F.col("n_days") >= MIN_BASELINE_DAYS,
        F.sqrt(
            F.greatest(
                (F.col("q") - n * n) / (F.col("n_days") - 1)
                - F.col("m") * F.col("m"),
                F.lit(0.0),
            )
        ),
    )
    calc2 = calc.withColumn("sd", sd)
    z = (n - F.col("m")) / F.col("sd")
    return calc2.select(
        "event_type",
        "day_start",
        "hour_of_day",
        "n_events",
        F.col("m").alias("loo_mean"),
        F.when(F.col("sd") > 0, z).alias("z_score"),
        F.when((F.col("sd") > 0) & (F.abs(z) >= 3.0), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
