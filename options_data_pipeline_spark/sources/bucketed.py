"""Write-once BUCKETED TABLE store — co-located fact-fact joins with zero
shuffle.

At 100 TB the dominant cost of a repeated fact-fact join (lineitem ⨝
orders, events ⨝ events) is re-shuffling both sides on the join key every
run. Bucketing is Spark's durable answer: write each fact once, hash-
bucketed (and sorted) by the join key, and every subsequent equi-join on
that key reads co-located buckets — `SortMergeJoin` directly over
`Bucketed: true` scans, no Exchange on either side (plan-pinned in
tests/test_round11_ops.py). The same store also gives bucket PRUNING for
point lookups: an equality predicate on the bucket key reads 1 of N
buckets (`SelectedBucketsCount` in the scan).

Catalog scope: Spark's in-memory session catalog — tables live for the
session, files live at an explicit external LOCATION keyed by (sf_dir,
bucket count), so re-registration in a new session is a metadata-only
`CREATE TABLE` against the existing files (no rewrite; write-once
semantics across sessions). On a cluster the same code lands in the
shared metastore and the store is durable outright.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "symbol",
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Plain managed bucketed write (the original symbol-grain helper —
    dedup reads, state reconciliation, candle↔candle joins bucket on
    ``symbol``); the fact-store path below adds external locations and
    cross-session re-registration on top."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def _tag(sf_dir: str, buckets: int) -> str:
    # the store root participates so tests (or probes) pointing the store
    # elsewhere get distinct catalog names — the session catalog is shared
    key = f"{os.path.abspath(sf_dir)}:{buckets}:{_store_root()}"
    return hashlib.md5(key.encode()).hexdigest()[:8]


def _store_root() -> str:
    return os.path.join(tempfile.gettempdir(), "spark_graft_buckets")


def ensure_bucketed_facts(
    spark: SparkSession, sf_dir: str, buckets: int = _BUCKETS
) -> tuple[str, str]:
    """Idempotently provide bucketed twins of lineitem and orders, both
    bucketed+sorted by their order key, narrowed to the join/agg columns
    (column pruning belongs in the STORE for a write-once artifact).
    Returns the two table names. First call per (sf_dir, buckets) pays
    the one-time bucketed write; later calls in the same session are
    catalog hits; later SESSIONS re-register the existing files."""
    tag = _tag(sf_dir, buckets)
    li_name, ord_name = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    root = _store_root()
    for name, src, key, cols in (
        (
            li_name,
            "lineitem",
            "l_orderkey",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_quantity"],
        ),
        (ord_name, "orders", "o_orderkey", ["o_orderkey", "o_orderdate", "o_orderpriority"]),
    ):
        if spark.catalog.tableExists(name):
            continue
        loc = os.path.join(root, name)
        df = spark.read.parquet(os.path.join(sf_dir, f"{src}.parquet")).select(*cols)
        if os.path.isdir(loc):
            try:
                # files already written by an earlier session: re-register
                # metadata only — bucketed DDL with the existing location
                cols_ddl = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
                )
                spark.sql(
                    f"CREATE TABLE {name} ({cols_ddl}) USING parquet "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {buckets} BUCKETS LOCATION '{loc}'"
                )
                continue
            except Exception:  # noqa: BLE001  (torn dir from a crash: rewrite)
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                shutil.rmtree(loc, ignore_errors=True)
        (
            df.write.bucketBy(buckets, key)
            .sortBy(key)
            .option("path", loc)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return li_name, ord_name


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located join itself: lineitem ⨝ orders on the order key,
    SMJ over bucketed scans, zero Exchange below the join."""
    li_name, ord_name = ensure_bucketed_facts(spark, sf_dir)
    li, od = spark.table(li_name), spark.table(ord_name)
    # merge hint: declares the fact-fact intent — at toy SF the optimizer
    # would broadcast orders, which hides exactly the shuffle this store
    # exists to eliminate at 100 TB
    return li.hint("merge").join(
        od, li["l_orderkey"] == od["o_orderkey"]
    )
