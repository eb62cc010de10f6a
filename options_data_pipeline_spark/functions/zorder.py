"""Z-order (Morton) clustering — the multi-dimensional file-clustering
move behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: interleave the bits of
several sort keys so that sorting by ONE derived value co-locates rows
that are close in EVERY key, giving parquet row-group min/max stats
skipping power on all of them at once (a plain lexicographic sort only
skips on the leading column).

Spark-first: the z-value is a pure Column expression (bit shifts + ors —
whole-stage-codegen'd, no UDF), so the write path is just
``df.repartitionByRange(N, zvalue).sortWithinPartitions(zvalue)`` and
the read path is untouched parquet with better stats. Engine-portable
arithmetic: the same shift/or tree evaluates identically in DuckDB, so
the clustering audit is oracle-checked exactly.

At 100 TB this is a WRITE-side investment measured at READ time: the
``zorder_span_audit`` query quantifies it — per output bucket, the
fraction of each key's domain the bucket spans (narrower = more skips).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_col(cols: list[str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each integer column (values
    must be pre-scaled to [0, 2^bits); use rank- or min/max-scaling for
    arbitrary domains). Bit i of column j lands at position
    i * n_cols + j — columns beyond ~62/n_cols bits would overflow the
    long, guarded."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds the 62-bit budget")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i) % 2
            z = z + F.shiftleft(bit.cast("long"), i * n + j)
    return z


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The identical z-value as engine-neutral SQL arithmetic (for the
    DuckDB oracle): ``(x >> i) % 2 * 2^(i*n+j)`` summed."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((CAST({c} AS BIGINT) >> {i}) % 2) * {1 << (i * n + j)}")
    return " + ".join(terms)


def zorder_buckets(
    df: DataFrame, cols: list[str], n_buckets: int = 16, bits: int = 16
) -> DataFrame:
    """Assign each row its z-order bucket (what a clustered write would
    make a file): rows ranked by z-value, split into ``n_buckets`` equal
    ranks. ntile keeps the oracle exact; a real write uses
    repartitionByRange on the z-value (sampling-based, same geometry)."""
    from pyspark.sql import Window

    z = zvalue_col(cols, bits)
    return df.withColumn("zval", z).withColumn(
        "bucket", F.ntile(n_buckets).over(Window.orderBy("zval"))
    )
