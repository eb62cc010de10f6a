"""Cosine top-k similarity tests (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest

from options_data_pipeline_spark.functions.similarity import (
    cosine_topk,
    cosine_topk_partitioned,
    dot_col,
)


def vec_df(spark, rows, with_label=False):
    schema = "vec_id long, embedding array<float>" + (", label int" if with_label else "")
    return spark.createDataFrame(rows, schema)


def test_dot_product(spark):
    df = vec_df(spark, [(0, [1.0, 2.0, 3.0])])
    [r] = df.select(dot_col("embedding", "embedding").alias("d")).collect()
    assert r.d == pytest.approx(14.0)


def test_topk_orders_by_cosine(spark):
    rows = [
        (0, [1.0, 0.0]),   # query
        (1, [1.0, 0.0]),   # cosine 1.0
        (2, [1.0, 1.0]),   # cosine ~0.707
        (3, [0.0, 1.0]),   # cosine 0.0
        (4, [-1.0, 0.0]),  # cosine -1.0
    ]
    df = vec_df(spark, rows)
    out = cosine_topk(df.filter("vec_id = 0"), df, k=3).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.neighbor_id for r in ranked] == [1, 2, 3]
    assert ranked[0].cosine == pytest.approx(1.0)


def test_topk_tie_break_by_neighbor_id(spark):
    rows = [(0, [1.0, 0.0]), (5, [2.0, 0.0]), (3, [3.0, 0.0])]  # both cosine 1.0
    df = vec_df(spark, rows)
    out = sorted(cosine_topk(df.filter("vec_id = 0"), df, k=2).collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in out] == [3, 5]


def test_rp_lsh_subset_of_brute_force(spark):
    """LSH candidates are a subset of the exact result (never false
    positives after verification); recall at cosine≥0.35 (θ≈70°, the hard
    regime for sign-LSH) stays above the 4×4-band theoretical floor."""
    from options_data_pipeline_spark.functions.similarity import (
        rp_lsh_near_dup_pairs,
        cosine_near_dup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh = {
        (r.id_a, r.id_b)
        for r in rp_lsh_near_dup_pairs(emb, 0.35, n_planes=16, bands=4).collect()
    }
    brute = {(r.id_a, r.id_b) for r in cosine_near_dup_pairs(emb, 0.35).collect()}
    assert lsh <= brute
    if brute:
        assert len(lsh) / len(brute) >= 0.25


def test_rp_lsh_auto_params_scale_with_corpus(spark):
    """Default args are the scale-safe path: band width grows with log N
    (bucket count ∝ N), bands stay at 8, and the auto run still returns a
    subset of the brute-force pairs."""
    from options_data_pipeline_spark.functions.similarity import (
        auto_rp_lsh_params,
        cosine_near_dup_pairs,
        rp_lsh_near_dup_pairs,
    )

    assert auto_rp_lsh_params(2_000) == (64, 8)          # floor: 8-bit bands
    assert auto_rp_lsh_params(20_000) == (88, 8)         # w=11 → 2048 buckets
    assert auto_rp_lsh_params(200_000) == (112, 8)       # w=14
    assert auto_rp_lsh_params(1_000_000_000) == (208, 8) # w=26 — still sane
    np_, nb = auto_rp_lsh_params(2_000_000)
    assert (np_ // nb) >= 17  # 2^17 buckets ≥ N/16

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    auto = {(r.id_a, r.id_b) for r in rp_lsh_near_dup_pairs(emb, 0.35).collect()}
    brute = {(r.id_a, r.id_b) for r in cosine_near_dup_pairs(emb, 0.35).collect()}
    assert auto <= brute


def test_kmeans_ivf_recall(spark):
    """k-means coarse cells partition the corpus and single-probe IVF
    keeps reasonable top-k recall vs brute force."""
    from options_data_pipeline_spark.functions.similarity import (
        kmeans_cells,
        cosine_topk,
        cosine_topk_partitioned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cells = kmeans_cells(emb, k=4, iters=2)
    counts = {r.cell: r["count"] for r in cells.groupBy("cell").count().collect()}
    n = sum(counts.values())
    assert len(counts) >= 2 and max(counts.values()) < n  # a real partition
    with_cell = emb.join(cells.withColumnRenamed("vid", "vec_id"), "vec_id")
    q = with_cell.filter("vec_id < 5")
    ivf = {(r.query_id, r.neighbor_id)
           for r in cosine_topk_partitioned(q, with_cell, k=5, cell_col="cell").collect()}
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb.filter("vec_id < 5"), emb, k=5).collect()}
    assert len(ivf & brute) / len(brute) >= 0.4


def test_multiprobe_recall_at_least_single_probe(spark):
    """nprobe=2 candidate sets are supersets of single-probe (cell 1 of 2
    is the argmin cell), so recall vs brute force can only improve."""
    from options_data_pipeline_spark.functions.similarity import (
        centroid_top_cells,
        cosine_topk,
        cosine_topk_partitioned,
        fixed_centroids,
        with_cell,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = fixed_centroids(8, 64)
    corpus = with_cell(emb, cents)
    q1 = corpus.filter("vec_id < 5")
    qp = (
        emb.filter("vec_id < 5")
        .select(
            "vec_id",
            "embedding",
            centroid_top_cells("embedding", cents, 2).alias("p"),
        )
        .select("vec_id", "embedding", F.explode("p").alias("cell"))
    )
    single = {(r.query_id, r.neighbor_id)
              for r in cosine_topk_partitioned(q1, corpus, k=5, cell_col="cell").collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in cosine_topk_partitioned(qp, corpus, k=5, cell_col="cell").collect()}
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb.filter("vec_id < 5"), emb, k=5).collect()}
    recall_1 = len(single & brute) / len(brute)
    recall_2 = len(multi & brute) / len(brute)
    assert recall_2 >= recall_1


def test_kmeans_multiprobe_recall_at_least_single_probe(spark):
    """VERDICT r3 #8: multiprobe over the LEARNED quantizer. nprobe=2
    candidate sets are supersets of single-probe on the same k-means
    cells, so recall vs brute force can only improve — and must clear a
    floor showing the learned cells are real."""
    from options_data_pipeline_spark.functions.similarity import (
        centroid_top_cells,
        cosine_topk,
        cosine_topk_partitioned,
        kmeans_centroids,
        with_cell,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_centroids(emb, k=8, iters=3)
    corpus = with_cell(emb, cents)
    q1 = corpus.filter("vec_id < 5")
    qp = (
        emb.filter("vec_id < 5")
        .select(
            "vec_id",
            "embedding",
            centroid_top_cells("embedding", cents, 2).alias("p"),
        )
        .select("vec_id", "embedding", F.explode("p").alias("cell"))
    )
    single = {(r.query_id, r.neighbor_id)
              for r in cosine_topk_partitioned(q1, corpus, k=5, cell_col="cell").collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in cosine_topk_partitioned(qp, corpus, k=5, cell_col="cell").collect()}
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb.filter("vec_id < 5"), emb, k=5).collect()}
    recall_1 = len(single & brute) / len(brute)
    recall_2 = len(multi & brute) / len(brute)
    assert recall_2 >= recall_1
    assert recall_2 >= 0.4  # learned cells must carry real neighbors


def test_quantize_int8_error_bound(spark):
    """Symmetric scalar quantization: every reconstruction error is
    bounded by scale/2 (round-to-nearest), and an all-zero vector
    quantizes losslessly."""
    from options_data_pipeline_spark.functions.similarity import quantize_int8_stats

    rows = [(0, [1.0, -0.5, 0.25, 127.0]), (1, [0.0, 0.0, 0.0, 0.0]), (2, [-3.0, 2.0, 0.1, -0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_int8_stats(df).collect()}
    for vid, r in out.items():
        assert r.max_abs_err <= r.scale / 2 + 1e-12
        assert r.mse <= (r.scale / 2) ** 2 + 1e-12
    assert out[1].mse == 0.0 and out[1].max_abs_err == 0.0


def test_partitioned_probes_only_own_cell(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 0),   # same cell — found
        (2, [1.0, 0.0], 1),   # perfect match but other cell — not probed
    ]
    df = vec_df(spark, rows, with_label=True)
    out = cosine_topk_partitioned(df.filter("vec_id = 0"), df, k=5).collect()
    assert {r.neighbor_id for r in out} == {1}


def test_centroid_argmin_builds_bounded_plan_at_large_k(spark):
    """Verdict #8: the aggregate-fold argmin must stay a single flat
    expression at IVF-realistic k (the old unrolled CASE-WHEN chain built
    O(k)-deep nested plans). k=64 × dim=16 must assign in bounded time and
    agree with a NumPy argmin."""
    import time

    import numpy as np

    from options_data_pipeline_spark.functions.similarity import (
        assign_cells,
        fixed_centroids,
    )

    k, dim = 64, 16
    cents = fixed_centroids(k, dim)
    rng = np.random.default_rng(7)
    vecs = rng.uniform(-1, 1, size=(50, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id int, embedding array<double>",
    )
    t0 = time.monotonic()
    got = {r.vid: r.cell for r in assign_cells(df, cents).collect()}
    assert time.monotonic() - t0 < 60  # plan build + run, not exponential
    c = np.array(cents)
    want = np.argmin(((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1)
    assert got == {i: int(want[i]) for i in range(len(vecs))}


def test_pq_encode_codes_and_error(spark):
    """PQ invariants: codes land in [0, ksub); a vector equal to the
    concatenation of one centroid per codebook reconstructs with ~0 error
    and exactly those codes."""
    from options_data_pipeline_spark.functions.similarity import (
        pq_codebooks,
        pq_encode,
    )

    books = pq_codebooks()
    perfect = [x for j in range(4) for x in books[j][3]]  # centroid 3 each
    noisy = [x + 0.5 for x in perfect]
    df = spark.createDataFrame(
        [(1, perfect), (2, noisy)], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: r for r in pq_encode(df, books).collect()}
    assert [out[1][f"code_{j}"] for j in range(4)] == [3, 3, 3, 3]
    assert out[1].recon_err == pytest.approx(0.0, abs=1e-9)
    assert out[2].recon_err > 0.5
    for j in range(4):
        assert 0 <= out[2][f"code_{j}"] < 8


def test_pq_adc_self_distance_equals_recon_err(spark):
    """ADC identity: for a query equal to a corpus vector, the asymmetric
    distance to that vector is exactly the vector's own PQ reconstruction
    error (both on the 9-dp grid)."""
    from options_data_pipeline_spark.functions.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    books = pq_codebooks()
    vec = [((i * 37) % 100) / 100.0 - 0.5 for i in range(64)]
    other = [((i * 11) % 100) / 100.0 - 0.5 for i in range(64)]
    corpus = spark.createDataFrame(
        [(1, vec), (2, other)], "vec_id long, embedding array<double>"
    )
    query = spark.createDataFrame([(99, vec)], "vec_id long, embedding array<double>")
    recon = {r.vec_id: r.recon_err for r in pq_encode(corpus, books).collect()}
    out = {r.neighbor_id: r for r in pq_adc_topk(query, corpus, k=2, books=books).collect()}
    assert out[1].adc_dist == pytest.approx(recon[1], abs=1e-9)
    assert out[1].rank == 1  # self-identical vector ranks first


def test_kmeans_index_atomic_layout_and_stale_root(spark, tmp_path):
    """build_kmeans_index publishes corpus/ + centroids/ under ONE root in
    one rename; a root missing corpus/ (stale layout) must raise rather
    than silently read mismatched halves; overwrite=True rebuilds."""
    import os
    from pyspark.sql import Row
    from options_data_pipeline_spark.functions.similarity import build_kmeans_index

    vecs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 4), float((i * 7) % 5)]) for i in range(40)]
    )
    root = str(tmp_path / "idx")
    corpus, cents = build_kmeans_index(vecs, root, k=2, iters=1)
    assert os.path.isdir(os.path.join(root, "corpus"))
    assert os.path.isdir(os.path.join(root, "centroids"))
    assert corpus.count() == 40 and len(cents) == 2
    # no leftover staging dirs after a successful publish
    parent = os.path.dirname(root)
    assert not [d for d in os.listdir(parent) if ".build-" in d]
    # second call reads back without rebuilding (same result)
    corpus2, cents2 = build_kmeans_index(vecs, root, k=2, iters=1)
    assert cents2 == cents
    # stale layout: a root without corpus/ raises
    stale = str(tmp_path / "stale")
    os.makedirs(os.path.join(stale, "not_corpus"))
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="corpus"):
        build_kmeans_index(vecs, stale, k=2, iters=1)
    # overwrite=True clears and rebuilds the stale root
    corpus3, cents3 = build_kmeans_index(vecs, stale, k=2, iters=1, overwrite=True)
    assert cents3 == cents


def test_vector_index_path_gc_and_fingerprint(tmp_path, monkeypatch):
    """_vector_index_path: GC removes superseded fingerprints and crashed
    staging dirs older than the grace window, keeps the live fingerprint
    and young dirs; same source → same path."""
    import os
    import time
    from options_data_pipeline_spark import registry

    # point the warehouse somewhere disposable
    monkeypatch.setattr(
        registry, "__file__", str(tmp_path / "pkg" / "registry.py")
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    (sf_dir / "embeddings.parquet").write_bytes(b"fake-parquet-bytes")

    p1 = registry._vector_index_path(str(sf_dir), "kmeans_index")
    assert registry._vector_index_path(str(sf_dir), "kmeans_index") == p1  # stable

    kind_dir = os.path.dirname(p1)
    os.makedirs(kind_dir, exist_ok=True)
    old_fp = os.path.join(kind_dir, "deadbeef0000")
    old_stage = os.path.join(kind_dir, "deadbeef0000.build-ab")
    young = os.path.join(kind_dir, "feedface1111")
    for d in (old_fp, old_stage, young):
        os.makedirs(d)
    stale_t = time.time() - 3600
    os.utime(old_fp, (stale_t, stale_t))
    os.utime(old_stage, (stale_t, stale_t))

    registry._vector_index_path(str(sf_dir), "kmeans_index")
    assert not os.path.exists(old_fp)      # superseded, past grace: GC'd
    assert not os.path.exists(old_stage)   # crashed staging: GC'd
    assert os.path.exists(young)           # inside grace window: kept

    # content rewrite (file mtime/size change) → different fingerprint
    time.sleep(0.01)
    (sf_dir / "embeddings.parquet").write_bytes(b"fake-parquet-bytes-v2!")
    assert registry._vector_index_path(str(sf_dir), "kmeans_index") != p1


def test_learned_pq_beats_fixed_codebooks(spark):
    """Training the codebooks on the corpus must strictly reduce mean
    reconstruction error vs the md5-derived fixed books (measured 18.6×
    at sf0.1; this guards the training loop end-to-end)."""
    from pyspark.sql import functions as F

    from options_data_pipeline_spark.functions.similarity import (
        pq_encode,
        pq_kmeans_codebooks,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    fixed = pq_encode(emb).agg(F.avg("recon_err")).first()[0]
    books = pq_kmeans_codebooks(emb)
    learned = pq_encode(emb, books).agg(F.avg("recon_err")).first()[0]
    assert learned < fixed / 2
    # structure: m books of ksub centroids of dim/m floats
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 16 for b in books for c in b)


def test_semdedup_keepers_have_no_near_dup_pair(spark):
    """The SemDeDup invariant: after pruning to component reps, NO pair
    of survivors is still cosine-similar above the threshold (two
    near-dup reps would have shared an edge and collapsed into one
    component); and every pruned doc maps to a rep that survives."""
    from options_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    out = registry.queries()["semdedup_prune"](spark, sf)
    rows = out.collect()
    reps = {r.rep_id for r in rows}
    members = {r.vec_id for r in rows}
    assert reps <= members  # every rep is itself a component member
    dropped = members - reps

    from options_data_pipeline_spark.functions.similarity import (
        cosine_near_dup_pairs,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf)
    kept = emb.join(
        emb.sparkSession.createDataFrame(
            [(i,) for i in dropped], "vec_id long"
        ),
        "vec_id",
        "left_anti",
    )
    survivors_pairs = cosine_near_dup_pairs(
        kept, threshold=0.35, cell_col="label"
    ).collect()
    assert survivors_pairs == []


def test_hard_negatives_exclude_own_label(spark):
    """Every mined negative has a different label than its query, ranks
    are dense from 1, and ordering is cosine-desc with id tiebreak."""
    from options_data_pipeline_spark.functions.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 7),   # query, label 7
        (1, [1.0, 0.0], 7),   # same label — excluded even at cosine 1.0
        (2, [1.0, 0.1], 3),   # hard negative (closest other-label)
        (3, [0.0, 1.0], 3),
        (4, [-1.0, 0.0], 5),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = sorted(
        hard_negative_topk(df.filter("vec_id = 0"), df, k=3).collect(),
        key=lambda r: r.rank,
    )
    assert [r.neighbor_id for r in out] == [2, 3, 4]
    assert 1 not in {r.neighbor_id for r in out}
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].cosine > out[1].cosine > out[2].cosine


def test_hard_negatives_k_caps_output(spark):
    from options_data_pipeline_spark.functions.similarity import hard_negative_topk

    rows = [(i, [1.0, float(i)], i % 2) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negative_topk(df.filter("vec_id = 0"), df, k=2).collect()
    assert len(out) == 2
    assert all(r.rank <= 2 for r in out)


def test_kcenter_coreset_invariants(spark):
    """Farthest-point traversal invariants: k distinct picks, the seed is
    the lowest id, and the selection distance sequence is non-increasing
    (each new center's min-dist can only shrink as the set grows)."""
    from options_data_pipeline_spark.functions.similarity import kcenter_coreset

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted(kcenter_coreset(df, k=5).collect(), key=lambda r: r.rank)
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == 5
    assert ids[0] == 0  # lowest-id seed
    dists = [r.sel_dist for r in out[1:]]
    assert all(d is not None for d in dists)
    assert all(a >= b - 1e-12 for a, b in zip(dists, dists[1:]))


def test_mrl_truncation_ratio_hand_computed(spark):
    """A vector concentrated in dim 0 keeps ratio 1.0 at every prefix; a
    uniform all-ones vector keeps exactly sqrt(k/64)."""
    import math

    from options_data_pipeline_spark import registry

    import os, tempfile
    qs = registry.queries()
    with tempfile.TemporaryDirectory() as d:
        rows = [
            (0, [1.0] + [0.0] * 63, 0),
            (1, [1.0] * 64, 0),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
        out = {r.prefix_dim: r for r in qs["mrl_truncation_audit"](spark, d).collect()}
    for k in (8, 16, 32):
        assert out[k].n_vecs == 2
        assert out[k].max_ratio == 1.0  # the concentrated vector
        assert out[k].min_ratio == __import__("pytest").approx(
            math.sqrt(k / 64.0), abs=1e-12
        )


def test_ivf_cell_balance_shares_sum_to_one(spark):
    from options_data_pipeline_spark import registry

    qs = registry.queries()
    rows = qs["ivf_cell_balance"](spark, "/root/testdata/sf0.001").collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == n  # every vector lands in a cell
