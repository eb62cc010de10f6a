"""Distribution-drift primitives shared by the streaming monitor
(streaming/drift_stream.py) and its batch parity twin: fixed-width
value binning against a stored REFERENCE range, and the two-sample
chi-square between a reference cell table and a live cell table.

The registry's ``chi2_drift`` is the one-shot batch shape (early vs
late month-halves of one table); the production monitoring loop instead
freezes a REFERENCE histogram once (the distribution the model was
trained on) and compares the live stream against it per micro-batch —
these helpers are that loop's shared math, so the streaming report and
the batch recomputation are structurally identical (the seasonal-stream
parity pattern).

Exactness contract (oracle-grade even though only tests consume it):
counts are exact integers; expected counts and per-cell terms are
mirrored double chains; the cross-bin sum rides the 12-dp DECIMAL grid
(order-free); a side with an empty type emits NULL, never a fake
verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-width bins over the reference range
N_BINS = 8


def value_range(events: DataFrame) -> DataFrame:
    """1-row (mn, mx) over non-null values — the reference range the
    monitor freezes; live values outside it clamp into the edge bins
    (floor + least, below)."""
    return events.filter(F.col("value").isNotNull()).agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )


def bin_expr(n_bins: int = N_BINS) -> F.Column:
    """Bin id for ``value`` against broadcast ``mn``/``mx`` columns:
    degenerate range -> bin 0; values clamp into [0, n_bins-1] so
    out-of-reference live values land in the edge bins instead of
    fabricating new cells."""
    # clamp the DOUBLE before floor/cast: a far-out-of-range live value
    # otherwise floors to a huge long and raises CAST_OVERFLOW under
    # ANSI — the exact case the clamp exists for
    scaled = (
        (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * n_bins
    )
    clamped = F.greatest(
        F.least(scaled, F.lit(float(n_bins - 1))), F.lit(0.0)
    )
    return (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(F.floor(clamped).cast("int"))
        .alias("bin")
    )


def hist_cells(events: DataFrame, rng: DataFrame) -> DataFrame:
    """(event_type, bin, n) exact counts for one slice of events binned
    against the (broadcast, 1-row) reference range — the associative
    partial every micro-batch reduces to; disjoint slices merge by
    summing n."""
    return (
        events.filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .crossJoin(F.broadcast(rng))
        .select("event_type", bin_expr())
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def chi2_between(
    ref_cells: DataFrame, live_cells: DataFrame, threshold: float = 4.0
) -> DataFrame:
    """Two-sample chi-square per event_type between a reference cell
    table and a live cell table (both (event_type, bin, n)). Missing
    cells on either side densify to 0 through the full outer join —
    a bin the reference never saw still contributes to the statistic.
    ``is_drifted`` = chi2/dof > threshold (≈ p < 0.0001 at dof 7 for
    the default 4.0)."""
    a = ref_cells.select(
        "event_type", "bin", F.col("n").alias("o_ref")
    )
    b = live_cells.select(
        "event_type", "bin", F.col("n").alias("o_live")
    )
    cells = (
        a.join(b, ["event_type", "bin"], "full_outer")
        .select(
            "event_type",
            "bin",
            F.coalesce("o_ref", F.lit(0)).alias("o_ref"),
            F.coalesce("o_live", F.lit(0)).alias("o_live"),
        )
    )
    w_t = Window.partitionBy("event_type")
    tot = cells.select(
        "*",
        F.sum("o_ref").over(w_t).alias("t_ref"),
        F.sum("o_live").over(w_t).alias("t_live"),
    )
    n_d = (F.col("t_ref") + F.col("t_live")).cast("double")
    row_d = (F.col("o_ref") + F.col("o_live")).cast("double")
    e_ref = row_d * F.col("t_ref").cast("double") / n_d
    e_live = row_d * F.col("t_live").cast("double") / n_d
    term = (
        (F.col("o_ref").cast("double") - e_ref)
        * (F.col("o_ref").cast("double") - e_ref)
        / e_ref
        + (F.col("o_live").cast("double") - e_live)
        * (F.col("o_live").cast("double") - e_live)
        / e_live
    )
    # guard BEFORE the arithmetic: with an empty side e_* is 0 and the
    # term divides by zero (ANSI mode raises, non-ANSI poisons the sum)
    terms = tot.select(
        "event_type",
        "t_ref",
        "t_live",
        F.when(
            (F.col("t_ref") > 0) & (F.col("t_live") > 0),
            F.round(term, 12).cast("decimal(38,12)"),
        ).alias("term"),
    )
    both = (F.col("t_ref") > 0) & (F.col("t_live") > 0)
    chi2 = F.when(both, F.col("s").cast("double"))
    per_dof = F.when(
        both & (F.col("n_bins") > 1),
        F.col("s").cast("double") / (F.col("n_bins") - 1).cast("double"),
    )
    return (
        terms.groupBy("event_type", "t_ref", "t_live")
        .agg(F.count(F.lit(1)).alias("n_bins"), F.sum("term").alias("s"))
        .select(
            "event_type",
            F.col("t_ref").alias("n_ref"),
            F.col("t_live").alias("n_live"),
            "n_bins",
            chi2.alias("chi2"),
            per_dof.alias("chi2_per_dof"),
            F.when(both & (F.col("n_bins") > 1), per_dof > threshold).alias(
                "is_drifted"
            ),
        )
    )
