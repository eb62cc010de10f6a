"""Drift-GATED document ingest (round-12 verdict item 6): promote the
ks/chi2/tv drift family from read-only diagnostics to an ingest-time
DECISION — each micro-batch's per-source value distribution is KS-tested
against a stored reference, and a drifted source's rows are quarantined
(appended to a `quarantine` table instead of the corpus) with the same
replay-safe semantics as every ingest loop here.

Why at the door: a source that silently shifts (scraper broke, upstream
re-encoded, spam flood) poisons a training corpus fastest through the
ingest path; routing the batch to quarantine keeps the corpus
distribution stable while preserving the rows for human triage — the
reference's alert-escalation idea (alert_manager.py) applied to data
quality instead of connectivity.

Replay safety: the gate is DETERMINISTIC given (batch, reference) — the
reference histogram is a stored, versioned artifact, not a rolling
window over the corpus (a corpus-dependent gate would route a replayed
batch differently after other batches landed). Both arms' appends are
doc_id-idempotent, and freshness is checked against BOTH tables, so a
crash after either append converges on replay with zero duplicates.

Scale posture: the KS test runs at VALUE-GRID grain (distinct values
per source in the BATCH — bounded by the value domain, not the batch),
the reference grid is a bounded broadcast, CDF windows are partitioned
per source (registry `ks_drift_sources` discipline). Everything else is
O(batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sink import idempotent_append_batch, sink_has_data


def reference_histogram(
    df: DataFrame, value_col: str = "n_chars"
) -> DataFrame:
    """Value-grid histogram (v, n_r) of the reference distribution —
    build once from a blessed corpus slice, store as a small parquet
    artifact, pass to the gate. Bounded by the value domain."""
    return df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("n_r")
    )


def ks_vs_reference(
    batch: DataFrame,
    ref_hist: DataFrame,
    value_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """Per-source two-sample KS statistic of the batch's ``value_col``
    distribution vs the reference histogram: max |F_src(v) − F_ref(v)|
    over the merged value grid. Returns (source, n_docs, ks_stat)."""
    grid_s = batch.groupBy(
        F.col(source_col).alias("source"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("n_s"))
    sources = grid_s.select("source").distinct()
    merged = (
        grid_s.select("source", "v", F.col("n_s").alias("ns_cnt"), F.lit(0).alias("nr_cnt"))
        .unionByName(
            ref_hist.select(F.col("v"), F.col("n_r"))
            .crossJoin(F.broadcast(sources))
            .select("source", "v", F.lit(0).alias("ns_cnt"), F.col("n_r").alias("nr_cnt"))
        )
        .groupBy("source", "v")
        .agg(F.sum("ns_cnt").alias("n_s"), F.sum("nr_cnt").alias("n_r"))
    )
    w = Window.partitionBy("source").orderBy("v")
    cdf = merged.select(
        "source",
        F.sum("n_s").over(w).alias("cs"),
        F.sum("n_r").over(w).alias("cr"),
    )
    tot_s = grid_s.groupBy("source").agg(F.sum("n_s").alias("ns"))
    tot_r = ref_hist.agg(F.sum("n_r").alias("nr"))
    return (
        cdf.join(F.broadcast(tot_s), "source")
        .crossJoin(F.broadcast(tot_r))
        .groupBy("source", F.col("ns").cast("long").alias("n_docs"))
        .agg(
            F.max(
                F.abs(
                    F.col("cs").cast("double") / F.col("ns")
                    - F.col("cr").cast("double") / F.col("nr")
                )
            ).alias("ks_stat")
        )
    )


def drift_gated_ingest_batch(
    batch: DataFrame,
    corpus_path: str,
    quarantine_path: str,
    ref_hist: DataFrame,
    threshold: float = 0.25,
    value_col: str = "n_chars",
    source_col: str = "source",
    text_col: str = "text",
) -> dict:
    """One micro-batch through the drift gate. Returns
    {"appended", "quarantined", "flagged_sources"}.

    Route: per-source KS vs the stored reference; sources with
    ks_stat > threshold are quarantined WHOLE (the per-source batch is
    the drift-detection unit — routing individual rows would bias the
    surviving distribution toward the reference and mask the drift),
    everything else lands in the corpus."""
    spark = batch.sparkSession
    if value_col not in batch.columns:
        batch = batch.withColumn(value_col, F.length(F.col(text_col)))
    fresh = batch
    for path in (corpus_path, quarantine_path):
        if sink_has_data(path):
            seen = spark.read.parquet(path).select("doc_id")
            fresh = fresh.join(seen, "doc_id", "left_anti")
    fresh = fresh.localCheckpoint(eager=True)
    if not fresh.take(1):
        return {"appended": 0, "quarantined": 0, "flagged_sources": []}

    ks = ks_vs_reference(fresh, ref_hist, value_col, source_col)
    flagged = sorted(
        r.source for r in ks.filter(F.col("ks_stat") > threshold).collect()
    )
    good = fresh.filter(~F.col(source_col).isin(flagged)) if flagged else fresh
    appended = idempotent_append_batch(
        good.coalesce(1), corpus_path, id_col="doc_id", prune_col="doc_id"
    )
    quarantined = 0
    if flagged:
        bad = fresh.filter(F.col(source_col).isin(flagged))
        quarantined = idempotent_append_batch(
            bad.coalesce(1), quarantine_path, id_col="doc_id", prune_col="doc_id"
        )
    return {
        "appended": appended,
        "quarantined": quarantined,
        "flagged_sources": flagged,
    }


def drift_gated_dedup_ingest_batch(
    batch: DataFrame,
    corpus_path: str,
    quarantine_path: str,
    sig_path: str,
    ref_hist: DataFrame,
    threshold: float = 0.25,
    dedup_threshold: float = 0.5,
    value_col: str = "n_chars",
    source_col: str = "source",
    text_col: str = "text",
    **dedup_kwargs,
) -> dict:
    """The FULL ingest door: drift gate THEN incremental near-dup ingest
    (streaming/doc_ingest.py) in one micro-batch — drifted sources'
    rows land in quarantine; surviving rows run the dedup pipeline
    (replay guard → decontamination → signature index → cross-batch +
    within-batch near-dup → corpus/signature appends). Returns
    {"appended", "quarantined", "flagged_sources"}.

    Gate-before-dedup ordering is deliberate: a drifted batch must not
    leave SIGNATURES behind (the dedup step appends to the signature
    index; quarantined docs would otherwise shadow future legitimate
    near-dups of themselves). Replay converges arm by arm: quarantined
    ids anti-join to 0, survivors hit dedup's own corpus guard."""
    from .doc_ingest import dedup_ingest_batch

    spark = batch.sparkSession
    if value_col not in batch.columns:
        batch = batch.withColumn(value_col, F.length(F.col(text_col)))
    fresh = batch
    if sink_has_data(quarantine_path):
        seen = spark.read.parquet(quarantine_path).select("doc_id")
        fresh = fresh.join(seen, "doc_id", "left_anti")
    fresh = fresh.localCheckpoint(eager=True)
    if not fresh.take(1):
        return {"appended": 0, "quarantined": 0, "flagged_sources": []}
    ks = ks_vs_reference(fresh, ref_hist, value_col, source_col)
    flagged = sorted(
        r.source for r in ks.filter(F.col("ks_stat") > threshold).collect()
    )
    quarantined = 0
    if flagged:
        bad = fresh.filter(F.col(source_col).isin(flagged))
        quarantined = idempotent_append_batch(
            bad.coalesce(1), quarantine_path, id_col="doc_id", prune_col="doc_id"
        )
        fresh = fresh.filter(~F.col(source_col).isin(flagged))
    appended = dedup_ingest_batch(
        fresh, corpus_path, sig_path, dedup_threshold,
        text_col=text_col, **dedup_kwargs,
    )
    return {
        "appended": appended,
        "quarantined": quarantined,
        "flagged_sources": flagged,
    }


def requalify_quarantine(
    spark: SparkSession,
    corpus_path: str,
    quarantine_path: str,
    ref_hist: DataFrame,
    threshold: float = 0.25,
    value_col: str = "n_chars",
    source_col: str = "source",
) -> dict:
    """Triage path: re-test quarantined rows (per source, over everything
    a source has in quarantine) against an UPDATED reference and promote
    passing sources into the corpus. Returns
    {"promoted", "promoted_sources"}.

    The reference is the knob: the gate's reference is static, so a
    quarantined batch fails the SAME test forever — requalification is
    meaningful exactly when the reference was re-blessed (the drifted
    shape turned out to be the new normal). Quarantine is an append-only
    LOG — promoted rows stay in it; corpus membership is the truth, and
    both the gate's freshness guard and this promotion anti-join the
    corpus, so requalify is idempotent (a second call promotes 0)."""
    if not sink_has_data(quarantine_path):
        return {"promoted": 0, "promoted_sources": []}
    q = spark.read.parquet(quarantine_path)
    if value_col not in q.columns:
        q = q.withColumn(value_col, F.length(F.col("text")))
    ks = ks_vs_reference(q, ref_hist, value_col, source_col)
    passing = sorted(
        r.source for r in ks.filter(F.col("ks_stat") <= threshold).collect()
    )
    if not passing:
        return {"promoted": 0, "promoted_sources": []}
    promoted = idempotent_append_batch(
        q.filter(F.col(source_col).isin(passing)).coalesce(1),
        corpus_path,
        id_col="doc_id",
        prune_col="doc_id",
    )
    return {"promoted": promoted, "promoted_sources": passing if promoted else []}


def run_drift_gated_ingest(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    ref_hist: DataFrame,
    threshold: float = 0.25,
    max_files_per_trigger: int = 8,
    schema: str = "doc_id long, source string, text string",
):
    """File-source stream over document drops → foreachBatch drift gate.
    Corpus lands in ``work_dir/corpus``, drifted sources' rows in
    ``work_dir/quarantine``. Returns the started query."""
    corpus = os.path.join(work_dir, "corpus")
    quarantine = os.path.join(work_dir, "quarantine")

    def _process(bdf: DataFrame, _bid: int) -> None:
        drift_gated_ingest_batch(bdf, corpus, quarantine, ref_hist, threshold)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", os.path.join(work_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
