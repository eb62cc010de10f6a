"""Drift-gated ingest (round-12 verdict item 6): a planted drifted
source lands in quarantine, clean sources pass, replay appends 0 to
either table, and the streaming twin routes identically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.streaming import drift_gate as dg
from options_data_pipeline_spark.streaming.sink import sink_has_data

SCHEMA = "doc_id long, source string, text string"


def _ref(spark):
    # reference: doc lengths 40..59 (20 distinct values, flat)
    rows = [(i, "ref", "x" * (40 + i % 20)) for i in range(200)]
    return dg.reference_histogram(
        spark.createDataFrame(rows, SCHEMA).withColumn(
            "n_chars", F.length("text")
        )
    ).localCheckpoint(eager=True)


def _batch(spark, ids_clean=range(0, 20), ids_bad=range(100, 110)):
    clean = [(i, "srcA", "x" * (40 + i % 20)) for i in ids_clean]
    # planted drift: every doc ~10x longer — KS vs the reference ≈ 1
    bad = [(i, "srcB", "y" * 500) for i in ids_bad]
    return spark.createDataFrame(clean + bad, SCHEMA)


def _ids(spark, path):
    if not sink_has_data(path):
        return set()
    return {r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()}


def test_ks_vs_reference_separates_sources(spark):
    ref = _ref(spark)
    batch = _batch(spark).withColumn("n_chars", F.length("text"))
    ks = {r.source: r.ks_stat for r in dg.ks_vs_reference(batch, ref).collect()}
    assert ks["srcB"] > 0.9  # disjoint supports → KS ≈ 1
    assert ks["srcA"] < 0.25  # same length law as the reference


def test_planted_drift_quarantined_clean_passes_replay_zero(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")
    ref = _ref(spark)
    batch = _batch(spark)
    rep = dg.drift_gated_ingest_batch(batch, corpus, quarantine, ref)
    assert rep == {
        "appended": 20,
        "quarantined": 10,
        "flagged_sources": ["srcB"],
    }
    assert _ids(spark, corpus) == set(range(0, 20))
    assert _ids(spark, quarantine) == set(range(100, 110))
    # quarantine keeps full rows for triage
    q = spark.read.parquet(quarantine)
    assert {r.source for r in q.select("source").distinct().collect()} == {"srcB"}

    # byte-identical replay touches NEITHER table
    rep2 = dg.drift_gated_ingest_batch(batch, corpus, quarantine, ref)
    assert rep2 == {"appended": 0, "quarantined": 0, "flagged_sources": []}
    assert _ids(spark, corpus) == set(range(0, 20))
    assert _ids(spark, quarantine) == set(range(100, 110))


def test_clean_followup_batch_from_flagged_source_passes(spark, tmp_path):
    """The gate is per-BATCH per-source: a source that drifted once is
    not banned forever — its next batch is re-tested (quarantine is a
    holding pen, not a blocklist)."""
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")
    ref = _ref(spark)
    dg.drift_gated_ingest_batch(_batch(spark), corpus, quarantine, ref)
    healed = spark.createDataFrame(
        [(200 + i, "srcB", "x" * (40 + i % 20)) for i in range(20)], SCHEMA
    )
    rep = dg.drift_gated_ingest_batch(healed, corpus, quarantine, ref)
    assert rep["appended"] == 20 and rep["quarantined"] == 0
    assert set(range(200, 220)) <= _ids(spark, corpus)


def test_streaming_twin_routes_identically(spark, tmp_path):
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    ref = _ref(spark)
    _batch(spark).coalesce(1).write.mode("append").parquet(src)
    q = dg.run_drift_gated_ingest(spark, src, work, ref)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _ids(spark, work + "/corpus") == set(range(0, 20))
    assert _ids(spark, work + "/quarantine") == set(range(100, 110))


def test_crash_between_corpus_and_quarantine_converges(spark, tmp_path, monkeypatch):
    """Crash after the corpus append but before the quarantine append
    (the only two-append window): replay finds the clean rows already
    in the corpus (append 0) and completes the quarantine append."""
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")
    ref = _ref(spark)
    batch = _batch(spark)

    real_append = dg.idempotent_append_batch
    calls = {"n": 0}

    def crash_on_second(df, path, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before quarantine append")
        return real_append(df, path, **kw)

    monkeypatch.setattr(dg, "idempotent_append_batch", crash_on_second)
    with pytest.raises(RuntimeError, match="injected"):
        dg.drift_gated_ingest_batch(batch, corpus, quarantine, ref)
    assert _ids(spark, corpus) == set(range(0, 20))
    assert _ids(spark, quarantine) == set()

    monkeypatch.setattr(dg, "idempotent_append_batch", real_append)
    rep = dg.drift_gated_ingest_batch(batch, corpus, quarantine, ref)
    assert rep["appended"] == 0 and rep["quarantined"] == 10
    assert _ids(spark, quarantine) == set(range(100, 110))


def test_requalify_promotes_after_reference_rebless(spark, tmp_path):
    """Triage path: once the reference is re-blessed to the new shape,
    requalify promotes the quarantined source into the corpus —
    idempotently (second call promotes 0), with quarantine kept as an
    append-only log and the gate's freshness guard still holding."""
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")
    ref = _ref(spark)
    batch = _batch(spark)
    dg.drift_gated_ingest_batch(batch, corpus, quarantine, ref)
    assert _ids(spark, quarantine) == set(range(100, 110))

    # old reference: nothing passes, nothing promoted
    rep = dg.requalify_quarantine(spark, corpus, quarantine, ref)
    assert rep == {"promoted": 0, "promoted_sources": []}

    # re-bless the reference to the drifted shape (length-500 docs)
    new_ref = dg.reference_histogram(
        spark.createDataFrame(
            [(1000 + i, "ref", "y" * 500) for i in range(50)], SCHEMA
        ).withColumn("n_chars", F.length("text"))
    )
    rep = dg.requalify_quarantine(spark, corpus, quarantine, new_ref)
    assert rep == {"promoted": 10, "promoted_sources": ["srcB"]}
    assert _ids(spark, corpus) == set(range(0, 20)) | set(range(100, 110))
    # quarantine log untouched; requalify idempotent
    assert _ids(spark, quarantine) == set(range(100, 110))
    rep2 = dg.requalify_quarantine(spark, corpus, quarantine, new_ref)
    assert rep2 == {"promoted": 0, "promoted_sources": []}
    # a replay of the ORIGINAL batch still touches nothing
    rep3 = dg.drift_gated_ingest_batch(batch, corpus, quarantine, ref)
    assert rep3 == {"appended": 0, "quarantined": 0, "flagged_sources": []}


def test_gate_then_dedup_full_door(spark, tmp_path):
    """Composed ingest door: drifted source → quarantine (and leaves NO
    signatures behind); clean near-dup of an already-ingested doc →
    dropped by the incremental dedup; clean unique docs → corpus.
    Replay touches nothing."""
    corpus = str(tmp_path / "corpus")
    quarantine = str(tmp_path / "quarantine")
    sigs = str(tmp_path / "sigs")
    ref = _ref(spark)

    long_text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )

    def clean_text(i, ln):
        # unique content per doc (so docs are NOT near-dups of each
        # other) at the reference's length law (so the gate passes)
        return (f"q{i}z a{i * 7}b " * 20)[:ln]

    # seed: one clean doc with a distinctive shingle block
    seed_rows = [(i, "srcA", clean_text(i, 40 + i % 20)) for i in range(19)] + [
        (19, "srcA", long_text)
    ]
    seed = spark.createDataFrame(seed_rows, SCHEMA)
    rep0 = dg.drift_gated_dedup_ingest_batch(
        seed, corpus, quarantine, sigs, ref
    )
    assert rep0["appended"] == 20 and rep0["quarantined"] == 0

    batch_rows = (
        # near-dup of doc 19 (case flip) from the clean source
        [(30, "srcA", long_text.upper())]
        # fresh unique clean docs keeping srcA's length law
        + [(31 + i, "srcA", clean_text(500 + i, 40 + (i * 7) % 20)) for i in range(19)]
        # drifted source
        + [(100 + i, "srcB", "y" * 500) for i in range(10)]
    )
    batch = spark.createDataFrame(batch_rows, SCHEMA)
    rep = dg.drift_gated_dedup_ingest_batch(batch, corpus, quarantine, sigs, ref)
    assert rep["flagged_sources"] == ["srcB"]
    assert rep["quarantined"] == 10
    assert rep["appended"] == 19  # near-dup 30 dropped by the dedup arm
    assert 30 not in _ids(spark, corpus)
    assert _ids(spark, quarantine) == set(range(100, 110))
    # quarantined docs left NO signatures (gate-before-dedup ordering)
    sig_ids = {r.doc_id for r in spark.read.parquet(sigs).select("doc_id").collect()}
    assert sig_ids.isdisjoint(set(range(100, 110)))

    # replay: quarantined ids anti-join away BEFORE the KS (so nothing
    # re-flags), survivors hit dedup's corpus guard — nothing moves
    rep2 = dg.drift_gated_dedup_ingest_batch(batch, corpus, quarantine, sigs, ref)
    assert rep2 == {"appended": 0, "quarantined": 0, "flagged_sources": []}
