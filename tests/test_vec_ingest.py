"""Streaming embedding ingest with incremental semantic dedup
(streaming/vec_ingest.py) — the vector twin of the doc loop."""

from __future__ import annotations

import math

from options_data_pipeline_spark.streaming.vec_ingest import (
    dedup_vec_ingest_batch,
)

CENTS = [[1.0, 0.0], [0.0, 1.0]]


def vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def ids_at(spark, path):
    import os

    if not os.path.isdir(path):
        return set()
    return {r.vec_id for r in spark.read.parquet(path).select("vec_id").collect()}


def test_cross_batch_semantic_dedup_and_cell_layout(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    n1 = dedup_vec_ingest_batch(
        vecs(spark, [(1, [1.0, 0.1]), (2, [0.1, 1.0])]), corpus, cents=CENTS
    )
    assert n1 == 2 and ids_at(spark, corpus) == {1, 2}

    # batch 2: a scaled copy of vec 1 (cosine 1.0) + a genuinely new one
    n2 = dedup_vec_ingest_batch(
        vecs(spark, [(10, [2.0, 0.2]), (11, [-1.0, 0.9])]), corpus, cents=CENTS
    )
    assert n2 == 1 and ids_at(spark, corpus) == {1, 2, 11}

    # stored layout is the index: partitioned by cell
    import os

    assert any(d.startswith("cell=") for d in os.listdir(corpus))


def test_within_batch_keeps_min_id_and_replay(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    batch = vecs(
        spark,
        [(7, [1.0, 0.0]), (5, [0.5, 0.0]), (9, [0.0, 1.0])],  # {5,7} colinear
    )
    n = dedup_vec_ingest_batch(batch, corpus, cents=CENTS)
    assert n == 2
    assert ids_at(spark, corpus) == {5, 9}
    assert dedup_vec_ingest_batch(batch, corpus, cents=CENTS) == 0  # replay
    assert ids_at(spark, corpus) == {5, 9}


def test_threshold_respected_across_cells(spark, tmp_path):
    """Vectors in different cells are never compared (cell-confined by
    design) — a near-dup landing in another cell survives; this is the
    documented IVF recall trade, not a bug."""
    corpus = str(tmp_path / "corpus")
    dedup_vec_ingest_batch(vecs(spark, [(1, [1.0, 0.05])]), corpus, cents=CENTS)
    # nearly parallel to vec 1 but assigned to the other centroid
    theta = math.radians(46)
    n = dedup_vec_ingest_batch(
        vecs(spark, [(2, [math.cos(theta), math.sin(theta)])]),
        corpus,
        threshold=0.5,
        cents=CENTS,
    )
    assert n == 1 and ids_at(spark, corpus) == {1, 2}
