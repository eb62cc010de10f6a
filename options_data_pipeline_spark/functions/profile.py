"""Generic per-column table profiling — the dataset-card / DQ summary a
warehouse publishes next to every table (null rates, exact distincts,
typed min/max), computed in ONE unpivot pass regardless of schema width.

Reference scope: generalizes the reference's ad-hoc per-sheet sanity
checks (row counts, empty-cell scans — reference core utils) into the
schema-driven profiler a 100 TB lakehouse actually runs.

Scale shape: the table is scanned ONCE; each row explodes into one
struct per column (a deliberate width-for-grain trade, the same shape
Spark's own `summary()` and Deequ profilers use), and everything
aggregates at (col_name) grain with a SINGLE count-distinct — which
Spark plans as a two-phase distinct aggregate (partial distinct at
(col_name, value) grain map-side), never the multi-distinct Expand that
doubles fact rows. No windows, no joins.

Float/format discipline (oracle hash-exactness):
 - numeric/timestamp min/max surface as DOUBLE (picked values —
   bit-exact cross-engine); timestamps as exact epoch MICROSECONDS
   (integer-valued doubles < 2^53 — never seconds-with-fraction, whose
   engine-internal divide order is not pinned);
 - string min/max compare by codepoint order in both engines;
 - distinct counts run on the STRING image of each value: per-engine
   injective formatting preserves the count without requiring the
   formats to agree across engines; DOUBLE columns are normalized
   ``x + 0.0`` on BOTH sides first so the one non-injective pair
   (-0.0 vs +0.0, equal as doubles, distinct as strings) collapses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dtypes whose min/max surface through the DOUBLE channel. Matched on
#: the EXACT base type (text before any '(' parameter list), never by
#: prefix: 'interval day' etc. also start with 'int' but cannot cast to
#: double — those route to the string branch with every other type.
_NUM_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def profile_columns(df: DataFrame) -> DataFrame:
    """One profile row per column of ``df``: (col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str). See module
    docstring for the channel/determinism contract."""
    entries = []
    for name, dtype in df.dtypes:
        col = F.col(name)
        if dtype == "timestamp":
            num = F.unix_micros(col).cast("double")
            key = col.cast("string")
            txt = F.lit(None).cast("string")
        elif dtype.split("(")[0] in _NUM_TYPES:
            base = (col + F.lit(0.0)) if dtype in ("float", "double") else col
            num = base.cast("double")
            key = base.cast("string")
            txt = F.lit(None).cast("string")
        else:
            num = F.lit(None).cast("double")
            key = col.cast("string")
            txt = col.cast("string")
        entries.append(
            F.struct(
                F.lit(name).alias("col_name"),
                key.alias("val_key"),
                num.alias("val_num"),
                txt.alias("val_txt"),
                col.isNull().alias("is_null"),
            )
        )
    stacked = df.select(F.explode(F.array(*entries)).alias("p")).select("p.*")
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("is_null").cast("long")).alias("n_nulls"),
        F.count_distinct(F.col("val_key")).alias("n_distinct"),
        F.min("val_num").alias("min_num"),
        F.max("val_num").alias("max_num"),
        F.min("val_txt").alias("min_str"),
        F.max("val_txt").alias("max_str"),
    )
