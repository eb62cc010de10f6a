"""Skew mitigation utilities (SURVEY.md §7 / 100 TB posture).

The reference never faces skew (178 symbols, one process). At 100 TB a
hot symbol (an index token receiving a large share of ticks) makes one
shuffle partition the straggler. Two standing mitigations:

 - AQE skew-join splitting is enabled in the session factory
   (``spark.sql.adaptive.skewJoin.enabled``) — handles skewed JOINs
   automatically at runtime.
 - For skewed AGGREGATIONS, :func:`salted_agg` does the classic two-phase
   rewrite: salt the key → partial agg at (key, salt) grain → final agg
   at key grain. Worst-case per-partition work drops by the salt factor;
   both aggs stay map-side-combinable hash aggs.

``salted_agg`` is semantics-preserving only for decomposable aggregates
(sum/count/min/max — anything with an associative merge). The OHLC
min_by/max_by pair decomposes too (merge keeps the row with the smaller/
larger ordering key), covered by :func:`salted_ohlc`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "_salt") -> DataFrame:
    """Uniform deterministic salt derived from a hash of the whole row's
    monotonic id when present, else spark_partition_id+monotonically_
    increasing_id — avoids rand() so retries/replays stay deterministic."""
    if "event_id" in df.columns:
        salt = F.pmod(F.col("event_id"), F.lit(buckets))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    return df.withColumn(col_name, salt)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output name → (partial_agg_expr, final_merge_expr), where
    the final expr references the partial output column by name, e.g.::

        salted_agg(ticks, ["symbol"], {
            "n":    (F.count(F.lit(1)),  F.sum("n")),
            "high": (F.max("price"),     F.max("high")),
        })
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_ohlc(
    ticks: DataFrame,
    interval: str = "5 minutes",
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe OHLC: identical result to operators.ohlc.ohlc_candles,
    but a hot (symbol, window) key spreads over ``buckets`` partial
    groups.

    Both phases keep SCALAR aggregation buffers (min_by/max_by on the
    arrival-order key plus the key's own min/max) — a struct-valued
    min/max would force SortAggregate (non-fixed-width buffer), the exact
    regression `test_ohlc_single_shuffle_hash_agg` pins on the unsalted
    plan. Merge picks each salt group's open/close by the group's
    order-key extreme; event_id uniqueness makes the two-phase result
    bit-identical to the one-phase aggregate."""
    salted = with_salt(ticks, buckets)
    partial = (
        salted.groupBy(
            F.col("symbol"), F.window("ts", interval).alias("w"), F.col("_salt")
        )
        .agg(
            F.min("event_id").alias("open_key"),
            F.expr("min_by(price, event_id)").alias("open_val"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max("event_id").alias("close_key"),
            F.expr("max_by(price, event_id)").alias("close_val"),
            F.count(F.lit(1)).alias("tick_count"),
        )
    )
    return (
        partial.groupBy("symbol", "w")
        .agg(
            F.expr("min_by(open_val, open_key)").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.expr("max_by(close_val, close_key)").alias("close"),
            F.sum("tick_count").alias("tick_count"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            "open",
            "high",
            "low",
            "close",
            "tick_count",
        )
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join via salt replication — the standing mitigation
    for a JOIN whose build side is too big to broadcast while the probe
    side's key distribution is hot (AQE's skew split handles sort-merge
    skew at runtime; this is the explicit rewrite for when the plan must
    be provably balanced, e.g. a hot index token owning 30% of ticks).

    The build side replicates ×``buckets`` with an explicit salt column
    (an `explode(sequence(...))` — rows, not a shuffle), the probe side
    salts deterministically (:func:`with_salt`, replay-stable), and the
    join key becomes (key, salt), spreading each hot key over ``buckets``
    partitions. Build-side growth is the price: ×buckets rows — choose
    buckets ≈ the hot key's partition-overload factor, not more.
    Result is row-identical to the unsalted join (each probe row meets
    exactly one replica of its build row)."""
    rep = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    # a NULL salt source (e.g. a row with NULL event_id) must not drop the
    # row — the inner equi-join never matches NULL; park such rows in
    # bucket 0 (join-key NULLs drop on both the plain and salted side, so
    # row-identity with the unsalted join holds)
    salted = with_salt(probe, buckets).withColumn(
        "_salt", F.coalesce(F.col("_salt"), F.lit(0))
    )
    return salted.join(rep, [key, "_salt"]).drop("_salt")
