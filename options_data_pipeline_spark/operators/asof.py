"""As-of (point-in-time) join — a custom operator Spark lacks natively.

The reference's only as-of-style need is "last known close" for gap-fill
(SURVEY §2.3 note); generalized here because point-in-time lookups are a
staple of market-data work (enrich a tick/event with the latest candle,
state snapshot, or reference price at or before its timestamp).

Spark-first construction (composition of built-ins — preference (a) from
the custom-operator ladder, no UDF): tag and union both sides, then one
``last(value, ignorenulls=True)`` window per value column over
(key, time, side) ordering, then keep left rows. Cost: one shuffle on the
key + a per-key sort — the same shape as any window function, no
broadcast-size or skew constraints beyond them. Right-side rows at
exactly the left timestamp match (inclusive as-of), by ordering the
right tag before the left tag at equal timestamps.

Alternative at scale for huge sparse right sides: bucketize time and
equi-join on (key, bucket) with a fallback pass — not needed while the
union-window plan holds one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "symbol",
    left_ts: str = "ts",
    right_ts: str = "window_start",
    value_cols: tuple[str, ...] = ("close",),
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right_ts <= left_ts`` within the same ``by`` key. Left rows with no
    prior right row get NULLs (left-outer as-of).

    Output: all left columns + ``{prefix}{value_col}`` columns.

    The right row travels as ONE struct so the pick is atomic: a NULL in
    one value column of the matched right row stays NULL rather than
    being back-filled from a farther row (per-column
    ``last(ignorenulls)`` would mix columns across right rows).
    """
    left_cols = left.columns
    v_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    row_type = StructType(
        [StructField(c, left.schema[c].dataType) for c in left_cols]
    )
    r = right.select(
        F.col(by),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts before left at equal ts → inclusive
        F.struct(*[F.col(c) for c in value_cols]).alias("_v"),
        F.lit(None).cast(row_type).alias("_row"),
    )
    l = left.select(
        F.col(by),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(v_type).alias("_v"),
        F.struct(*left_cols).alias("_row"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l.unionByName(r).select(
        "*", F.last("_v", ignorenulls=True).over(w).alias("_picked")
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_row.{c}").alias(c) for c in left_cols],
        *[F.col(f"_picked.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    by: str = "symbol",
    left_ts: str = "ts",
    right_ts: str = "window_start",
    value_cols: tuple[str, ...] = ("close",),
    tolerance_s: float = 5400.0,
    prefix: str = "nearest_",
) -> DataFrame:
    """merge_asof(direction='nearest'): for each left row, the right row
    minimizing |right_ts − left_ts| within ``tolerance_s`` seconds, ties
    broken toward the EARLIER right row. Left rows with no right row in
    tolerance get NULLs.

    Same one-shuffle union construction as :func:`asof_join`, but with
    BOTH direction windows computed over the single unioned frame (same
    symbol partitioning, ascending + descending sorts — Spark shuffles
    once and sorts twice); the nearest pick is then a row-local
    comparison, no join back. Output: left columns + ``{prefix}ts`` +
    ``{prefix}{value_col}`` columns."""
    left_cols = left.columns
    vcols = tuple(value_cols) + (right_ts,)
    v_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in vcols]
    )
    row_type = StructType(
        [StructField(c, left.schema[c].dataType) for c in left_cols]
    )
    l = left.select(
        F.col(by),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(v_type).alias("_v"),
        F.struct(*left_cols).alias("_row"),
    )
    r = right.select(
        F.col(by),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),  # right before left at equal ts (inclusive)
        F.struct(*[F.col(c) for c in vcols]).alias("_v"),
        F.lit(None).cast(row_type).alias("_row"),
    )
    wb = (
        Window.partitionBy(by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(F.desc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the right row travels as ONE struct so the nearest pick is atomic —
    # a NULL value column in the nearest right row stays NULL instead of
    # being filled from a farther row while nearest_ts points at the near
    # one (per-column last(ignorenulls) mixed columns across right rows)
    u = l.unionByName(r).select(
        "*",
        F.last("_v", ignorenulls=True).over(wb).alias("_b"),
        F.last("_v", ignorenulls=True).over(wf).alias("_f"),
    ).filter(F.col("_side") == 1)
    t = F.col("_t").cast("double")
    bdiff = t - F.col(f"_b.{right_ts}").cast("double")
    fdiff = F.col(f"_f.{right_ts}").cast("double") - t
    valid_b = F.col(f"_b.{right_ts}").isNotNull() & (bdiff <= tolerance_s)
    valid_f = F.col(f"_f.{right_ts}").isNotNull() & (fdiff <= tolerance_s)
    use_b = valid_b & (~valid_f | (bdiff <= fdiff))  # tie → earlier (backward)
    picks = [
        F.when(use_b, F.col(f"_b.{c}"))
        .when(valid_f, F.col(f"_f.{c}"))
        .alias(f"{prefix}{'ts' if c == right_ts else c}")
        for c in vcols
    ]
    return u.select(
        *[F.col(f"_row.{c}").alias(c) for c in left_cols], *picks
    )
