"""CDC apply: collapse a change log (inserts/updates/deletes) into the
current snapshot — the core warehouse "merge" the reference's
sheet-overwrite path approximates by rewriting whole tabs
(reference ``sheets_manager.py`` update flows rewrite the full range;
here the same end state is computed set-wise from the change history).

Latest-wins semantics: for each key, the change with the highest
sequence wins; if that winner is a delete, the key is absent from the
snapshot. This is the batch twin of Structured Streaming's
``dropDuplicatesWithinWatermark``+``foreachBatch``-merge pattern and of
Delta/Iceberg MERGE — expressed as ONE aggregate so Catalyst plans a
partial-aggregable max(struct) with a single shuffle at key grain. It
plans as a partial+final SortAggregate pair (struct buffers aren't
hash-map-mutable) sorted by GROUP KEY only — still map-side combining;
a window row_number would instead sort every raw change by (key, seq)
per partition and cannot partial-aggregate (the repo's struct-max
lesson, BASELINE §9).

100 TB posture: the only shuffle is groupBy(key); no sort, no window,
no join. Map-side combine collapses each executor's slice to one row
per key before the exchange — exactly how a 1000-executor daily-merge
compacts a trillion-row change feed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_latest_snapshot(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
    payload_cols: Sequence[str] | None = None,
    keep_deletes: bool = False,
) -> DataFrame:
    """Apply a CDC change log and return the live snapshot.

    ``seq_cols`` order changes within a key (lexicographic struct
    compare, first column most significant) and MUST be unique per key
    — include a monotonic change id as the last element to break
    timestamp ties deterministically; with duplicate sequences the
    struct-max would tie-break on op/payload bytes, which is not a
    version order. Output: key columns, ``last_<seq>`` columns, the
    winning payload as ``last_<col>``, plus ``n_changes`` /
    ``n_deletes`` audit counts. Keys whose LATEST change is a delete
    are dropped (their history still counted rows — they simply have
    no live row to carry them) — unless ``keep_deletes`` is set, which
    retains them as TOMBSTONE rows with a ``last_op`` column so an
    incremental consumer can suppress out-of-order inserts that arrive
    after the delete (the compacted-topic retention contract;
    streaming/cdc_stream.py relies on this).
    """
    keys = list(key_cols)
    seqs = list(seq_cols)
    if payload_cols is None:
        taken = set(keys) | set(seqs) | {op_col}
        payload_cols = [c for c in changes.columns if c not in taken]
    payload = list(payload_cols)
    pick = F.max(
        F.struct(
            *[F.col(c).alias(c) for c in seqs],
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(c) for c in payload],
        )
    ).alias("_last")
    snap = changes.groupBy(*keys).agg(
        pick,
        F.count(F.lit(1)).alias("n_changes"),
        F.sum(
            F.when(F.col(op_col) == delete_op, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_deletes"),
    )
    if not keep_deletes:
        snap = snap.filter(F.col("_last._op") != delete_op)
    op_out = [F.col("_last._op").alias("last_op")] if keep_deletes else []
    return snap.select(
        *keys,
        *[F.col(f"_last.{c}").alias(f"last_{c}") for c in seqs],
        *op_out,
        *[F.col(f"_last.{c}").alias(f"last_{c}") for c in payload],
        "n_changes",
        "n_deletes",
    )


def assert_unique_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    side: str = "input",
    max_examples: int = 5,
) -> None:
    """Fail loudly if ``df`` has more than one row for any key: one
    hash-agg pass at key grain (map-side combining, report-sized
    collect of only the duplicated keys), then a ``ValueError`` naming
    the worst offenders. Used by :func:`snapshot_diff`'s opt-in
    ``assert_unique`` to turn the silent fan-out wrong answer into a
    loud failure."""
    keys = list(key_cols)
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(max_examples + 1)
        .collect()
    )
    if dups:
        shown = [
            {**{k: r[k] for k in keys}, "n_rows": r["n_rows"]}
            for r in dups[:max_examples]
        ]
        more = " (and more)" if len(dups) > max_examples else ""
        raise ValueError(
            f"snapshot_diff: {side} snapshot violates the at-most-one-row-"
            f"per-key precondition on {keys}; duplicated keys{more}: {shown}"
        )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    assert_unique: bool = False,
) -> DataFrame:
    """Row-level diff between two snapshots of the same table — the
    inverse of :func:`cdc_latest_snapshot` (apply turns changes into a
    snapshot; diff recovers the changes between two snapshots), and the
    anti-entropy audit a pipeline runs after a backfill or migration to
    prove two copies agree.

    Both inputs must be SNAPSHOTS — at most one row per key (what
    cdc_latest_snapshot emits); a duplicated key would fan out through
    the full-outer join and report spurious pairs. Pass
    ``assert_unique=True`` to verify that precondition up front (one
    extra counting pass per side; raises ``ValueError`` with example
    keys instead of silently fanning out). One full-outer join
    on the key: ``added`` (key only in ``new``), ``removed`` (only in
    ``old``), ``changed`` (present in both, any compare column differs
    — null-safe struct compare, so NULL→value and value→NULL both
    count). Unchanged rows are dropped: at 100 TB
    the diff is the (small) output, never the inputs, and the join is
    key-partitioned on both sides with no skew beyond the key's own.
    Output: key columns, ``status``, plus ``old_<c>``/``new_<c>`` for
    each compare column.
    """
    keys = list(key_cols)
    if assert_unique:
        assert_unique_keys(old, keys, side="old")
        assert_unique_keys(new, keys, side="new")
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    comp = list(compare_cols)
    o = old.select(
        *keys, F.struct(*[F.col(c).alias(c) for c in comp]).alias("_old")
    )
    n = new.select(
        *keys, F.struct(*[F.col(c).alias(c) for c in comp]).alias("_new")
    )
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("changed"))
    )
    return (
        j.select(*keys, status.alias("status"), "_old", "_new")
        .filter(F.col("status").isNotNull())
        .select(
            *keys,
            "status",
            *[F.col(f"_old.{c}").alias(f"old_{c}") for c in comp],
            *[F.col(f"_new.{c}").alias(f"new_{c}") for c in comp],
        )
    )
