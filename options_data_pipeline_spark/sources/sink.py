"""Batch table sinks (reference S3/S4/S11).

Reference: append-only market_data sheet, full-overwrite atr_state sheet,
and a NEW SPREADSHEET per month (``sheets_client.py:93-109``). Spark-first:
date-partitioned parquet — ``partitionBy(year, month)`` replaces the
monthly-rotation scheme and gives partition pruning on every time-ranged
read; at 100 TB add day to the partition spec and cluster/bucket by symbol
inside partitions so the per-symbol window/ATR shuffles are co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_market_data(
    df: DataFrame,
    path: str,
    mode: str = "append",
    cluster: bool = True,
    **options: str,
) -> None:
    """S3/S11: append fact rows partitioned by (year, month) of the window.

    ``cluster=True`` sorts rows WITHIN each write task by (symbol,
    window_start) before writing — a task-local sort, no extra shuffle —
    so parquet row-group min/max statistics become tight per symbol and a
    ``symbol = 'X'`` (or window-ranged) read skips whole row groups
    instead of scanning them. At 100 TB this is the difference between a
    per-symbol query reading ~1/|symbols| of each file and reading all of
    it; the same idea Delta's Z-ORDER serves (one clustering column here,
    so a plain sort dominates). Verified by a row-group-stats test."""
    out = df.withColumn("year", F.year("window_start")).withColumn(
        "month", F.month("window_start")
    )
    if cluster:
        # partition columns lead the sort: the dynamic-partition writer
        # requires (year, month) ordering and would otherwise inject its
        # own (non-stable) sort, destroying the symbol clustering
        out = out.sortWithinPartitions("year", "month", "symbol", "window_start")
    out.write.mode(mode).options(**options).partitionBy("year", "month").parquet(path)


def read_market_data(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    return df.drop("year", "month")


def compact_market_data(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> dict[str, tuple[int, int]]:
    """Small-file compaction for the partitioned sink — the maintenance
    job every streaming-append table needs: micro-batch appends leave
    hundreds of tiny files per partition, and at 100 TB the scan's task
    count (and the NameNode/listing cost) is driven by file count, not
    bytes. Per (year, month) partition with ≥ ``min_files`` files: read,
    re-cluster (same symbol/window sort as the write path), rewrite as
    ⌈bytes/target⌉ files, atomically swap the directory.

    Returns {partition: (files_before, files_after)}. The swap is two
    renames (old → trash, staged → live) — atomic per rename on POSIX,
    but NOT atomic as a pair: between them the partition dir briefly does
    not exist, so on a local FS compaction requires no concurrent readers
    of that partition (root-level listings are safe — staging and trash
    live under ``_compact_tmp``, an underscore-prefixed dir that Spark's
    partition discovery treats as hidden, so a racing root read never
    parses a half-written dir as a ``month=`` value). On object stores
    run compaction under the manifest sink instead, where it is "write
    new segment + one manifest that supersedes N" — a single atomic
    publish."""
    import os
    import shutil
    import uuid

    results: dict[str, tuple[int, int]] = {}
    if not os.path.isdir(path):
        return results
    tmp_root = os.path.join(path, "_compact_tmp")
    for ydir in sorted(os.listdir(path)):
        if not ydir.startswith("year="):
            continue
        for mdir in sorted(os.listdir(os.path.join(path, ydir))):
            pdir = os.path.join(path, ydir, mdir)
            if not os.path.isdir(pdir):
                continue
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            if len(files) < min_files:
                continue
            total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
            n_out = max(1, -(-total // target_bytes))
            os.makedirs(tmp_root, exist_ok=True)
            tag = f"{ydir}-{mdir}-{uuid.uuid4().hex[:8]}"
            staged = os.path.join(tmp_root, f"{tag}.compact")
            (
                spark.read.parquet(pdir)
                .repartition(n_out)
                .sortWithinPartitions("symbol", "window_start")
                .write.mode("overwrite")
                .parquet(staged)
            )
            trash = os.path.join(tmp_root, f"{tag}.old")
            os.rename(pdir, trash)
            os.rename(staged, pdir)
            shutil.rmtree(trash, ignore_errors=True)
            after = len([f for f in os.listdir(pdir) if f.endswith(".parquet")])
            results[f"{ydir}/{mdir}"] = (len(files), after)
    shutil.rmtree(tmp_root, ignore_errors=True)
    return results


def refresh_daily_rollup(spark, sink_path: str, rollup_path: str) -> list[str]:
    """Incremental continuous-aggregate refresh: maintain a daily OHLC
    rollup of the (year, month)-partitioned candle sink, recomputing ONLY
    partitions whose source bytes changed since the last refresh.

    The reference recomputes summaries from full sheet reads
    (``write_pipeline.py`` read-back paths); at 100 TB a rollup that
    re-reads the world on every refresh is the cost center. This is the
    materialized-view maintenance contract instead: each source
    partition's (file count, total bytes, max mtime_ns) signature is
    stored next to the rollup; a refresh diffs signatures, re-aggregates
    only changed partitions (partition pruning bounds the read — one
    month of a 100 TB sink, not the sink), and publishes via dynamic
    partition overwrite so unchanged rollup partitions are never
    rewritten. Late-arriving writes to an OLD month change its signature
    and trigger exactly that month's re-roll — the late-data path falls
    out of the same diff. Idempotent: a re-run with no source change is
    a no-op (returns []).

    Returns the list of refreshed ``year=Y/month=M`` partition names."""
    import json
    import os
    import tempfile

    def _partition_sigs(root: str) -> dict[str, list]:
        sigs: dict[str, list] = {}
        if not os.path.isdir(root):
            return sigs
        for ydir in sorted(os.listdir(root)):
            if not ydir.startswith("year="):
                continue
            for mdir in sorted(os.listdir(os.path.join(root, ydir))):
                if not mdir.startswith("month="):
                    continue
                pdir = os.path.join(root, ydir, mdir)
                n, size, mt = 0, 0, 0
                for f in os.listdir(pdir):
                    if f.endswith(".parquet"):
                        st = os.stat(os.path.join(pdir, f))
                        n += 1
                        size += st.st_size
                        mt = max(mt, st.st_mtime_ns)
                sigs[f"{ydir}/{mdir}"] = [n, size, mt]
        return sigs

    sigs = _partition_sigs(sink_path)
    state_file = os.path.join(rollup_path, "_rollup_state.json")
    prev: dict[str, list] = {}
    if os.path.exists(state_file):
        with open(state_file) as fh:
            prev = json.load(fh)
    changed = sorted(p for p, s in sigs.items() if prev.get(p) != s)
    if changed:
        pairs = []
        for p in changed:
            ydir, mdir = p.split("/")
            pairs.append((int(ydir.split("=")[1]), int(mdir.split("=")[1])))
        src = spark.read.parquet(sink_path)
        pred = None
        for y, m in pairs:
            c = (F.col("year") == y) & (F.col("month") == m)
            pred = c if pred is None else (pred | c)
        daily = (
            src.filter(pred)  # partition pruning bounds the read
            .groupBy(
                "symbol",
                F.to_date("window_start").alias("day"),
                "year",
                "month",
            )
            .agg(
                F.min_by("open", F.col("window_start")).alias("open"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.max_by("close", F.col("window_start")).alias("close"),
                F.sum("tick_count").alias("tick_count"),
            )
        )
        mode_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            daily.write.mode("overwrite").partitionBy("year", "month").parquet(
                rollup_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode_before)
        # publish the new signatures atomically (write + rename)
        os.makedirs(rollup_path, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=rollup_path, suffix=".state")
        with os.fdopen(fd, "w") as fh:
            json.dump(sigs, fh)
        os.replace(tmp, state_file)
    return changed


def compact_flat_sink(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 8,
    partition_by: tuple[str, ...] = (),
    sort_within: tuple[str, ...] = (),
) -> tuple[int, int]:
    """Compaction for the INGEST-LOOP sinks (doc corpus, signature table,
    cell-partitioned vector corpus): one coalesced file per batch still
    accumulates a file per batch forever, and the ingest probe re-lists
    the whole sink every batch — compaction resets that tax.

    Whole-table variant of :func:`compact_market_data`: read everything,
    rewrite as ⌈bytes/target⌉ files (preserving ``partition_by`` layout
    and an optional ``sort_within`` clustering), swap directories via
    the sibling ``_compact_tmp`` staging. Same contracts: single-writer
    (never run while an ingest batch is active — compaction IS a
    writer), no concurrent readers of the table during the two-rename
    swap on a local FS; object stores run this under the manifest sink
    as segment-superseding commits instead.

    Returns (files_before, files_after); no-op below ``min_files``."""
    import os
    import shutil
    import uuid

    if not os.path.isdir(path):
        return (0, 0)

    def _files(root):
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(root)
            if "_compact_tmp" not in r
            for f in fs
            if f.endswith(".parquet")
        ]

    before = _files(path)
    if len(before) < min_files:
        return (len(before), len(before))
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, -(-total // target_bytes))
    tmp_root = os.path.join(os.path.dirname(os.path.abspath(path)), "_compact_tmp")
    os.makedirs(tmp_root, exist_ok=True)
    tag = uuid.uuid4().hex[:8]
    staged = os.path.join(tmp_root, f"{tag}.compact")
    df = spark.read.parquet(path).repartition(n_out)
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staged)
    trash = os.path.join(tmp_root, f"{tag}.old")
    os.rename(path, trash)
    os.rename(staged, path)
    shutil.rmtree(trash, ignore_errors=True)
    after = _files(path)
    shutil.rmtree(tmp_root, ignore_errors=True)
    return (len(before), len(after))
