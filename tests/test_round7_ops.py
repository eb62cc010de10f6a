"""Round-7 operator tests: adamic_adar, profile_columns, mmr_topk,
Poisson-bootstrap thresholds, compaction binning, seasonal LOO baseline."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.functions.graph import adamic_adar
from options_data_pipeline_spark.functions.profile import profile_columns
from options_data_pipeline_spark.functions.similarity import mmr_topk


# ---------------------------------------------------------------- adamic adar


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_adamic_adar_hand_computed(spark):
    # path graph 1-2-3 plus 1-4, 3-4: common neighbors of (1,3) are {2, 4};
    # (1,3) non-adjacent. deg: 1->2, 2->2, 3->2, 4->2.
    e = _edges(spark, [(1, 2), (2, 3), (1, 4), (3, 4)])
    out = adamic_adar(e, min_common=1).collect()
    rows = {(r.node_a, r.node_b): r for r in out}
    assert set(rows) == {(1, 3), (2, 4)}
    r = rows[(1, 3)]
    assert r.n_common == 2
    expected = 2 * round(1.0 / math.log(2.0), 12)
    assert r.aa_score == pytest.approx(expected, abs=1e-9)


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle 1-2-3: every 2-path closes into an existing edge -> empty
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert adamic_adar(e, min_common=1).count() == 0


def test_adamic_adar_center_degree_cap(spark):
    # star center 0 with 5 leaves: deg(0)=5. With the cap below 5 the
    # center is dropped and no candidate pairs survive; with cap >= 5
    # every leaf pair is predicted through the hub.
    star = [(0, i) for i in range(1, 6)]
    e = _edges(spark, star)
    assert adamic_adar(e, max_center_degree=4, min_common=1).count() == 0
    full = adamic_adar(e, max_center_degree=5, min_common=1)
    assert full.count() == 10  # C(5,2) leaf pairs
    one = full.filter((F.col("node_a") == 1) & (F.col("node_b") == 2)).first()
    assert one.aa_score == pytest.approx(round(1.0 / math.log(5.0), 12), abs=1e-9)


def test_adamic_adar_orientation_insensitive(spark):
    fwd = adamic_adar(_edges(spark, [(1, 2), (2, 3)]), min_common=1)
    rev = adamic_adar(_edges(spark, [(2, 1), (3, 2)]), min_common=1)
    assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, rev.collect()))


# ------------------------------------------------------------ profile_columns


def test_profile_columns_null_and_distinct_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", -0.0), (3, None, 0.0), (None, "b", None)],
        "id long, tag string, x double",
    )
    prof = {r.col_name: r for r in profile_columns(df).collect()}
    assert set(prof) == {"id", "tag", "x"}
    rid = prof["id"]
    assert (rid.n_rows, rid.n_nulls, rid.n_distinct) == (4, 1, 3)
    assert (rid.min_num, rid.max_num) == (1.0, 3.0)
    assert rid.min_str is None and rid.max_str is None
    rtag = prof["tag"]
    assert (rtag.n_nulls, rtag.n_distinct) == (1, 2)
    assert (rtag.min_str, rtag.max_str) == ("a", "b")
    assert rtag.min_num is None
    rx = prof["x"]
    # -0.0 and 0.0 collapse to ONE distinct value (the +0.0 normalization)
    assert (rx.n_nulls, rx.n_distinct) == (1, 2)
    assert (rx.min_num, rx.max_num) == (0.0, 1.5)


def test_profile_columns_timestamp_epoch_micros(spark):
    df = spark.sql(
        "SELECT timestamp'2024-01-02 03:04:05.123456' AS ts"
    )
    r = profile_columns(df).collect()[0]
    import datetime

    expect = datetime.datetime(
        2024, 1, 2, 3, 4, 5, 123456, tzinfo=datetime.timezone.utc
    ).timestamp() * 1_000_000
    assert r.min_num == r.max_num == expect


def test_profile_columns_interval_and_decimal_routing(spark):
    """Interval dtypes start with 'int' but cannot cast to double — they
    must route to the STRING branch (the zero-configuration contract);
    decimal(p,s) still rides the numeric channel."""
    df = spark.sql(
        "SELECT INTERVAL '3' DAY AS gap, CAST(2.50 AS DECIMAL(10,2)) AS amt"
    )
    prof = {r.col_name: r for r in profile_columns(df).collect()}
    g = prof["gap"]
    assert g.min_num is None and g.max_num is None  # not the numeric branch
    assert g.min_str == g.max_str and "3" in g.min_str
    a = prof["amt"]
    assert (a.min_num, a.max_num) == (2.5, 2.5)


# ------------------------------------------------------------------- mmr topk


def test_mmr_topk_first_pick_is_most_relevant_and_diversifies(spark):
    # probe (id 0) along e0; ids 1,2 nearly parallel to probe (1 slightly
    # closer), id 3 orthogonal-ish. Pure relevance top-3 = [1, 2, 3];
    # MMR must pick 1 first, then prefer 3 over the redundant 2.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0]),
        (2, [0.99, 0.141, 0.0]),
        (3, [0.2, 0.0, 0.98]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_topk(df, k=3, pool=3, lam=0.5)
    picks = [r.vec_id for r in out.orderBy("sel_rank").collect()]
    assert picks[0] == 1
    assert picks[1] == 3
    assert picks[2] == 2
    first = out.filter(F.col("sel_rank") == 1).first()
    assert first.max_sim is None and first.mmr_score is None


def test_mmr_topk_scores_monotone_nonincreasing(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_topk(df, k=5, pool=10).orderBy("sel_rank").collect()
    scores = [r.mmr_score for r in out[1:]]
    assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:]))
    assert len({r.vec_id for r in out}) == 5


# -------------------------------------------------- bootstrap / bins / seasonal


def test_poisson_thresholds_match_cdf():
    from options_data_pipeline_spark.registry import _poisson_thresholds

    ts = _poisson_thresholds()
    assert ts == sorted(ts)
    # final threshold covers all but ~1e-5 of the mass (P[X >= 8])
    assert ts[-1] / float(1 << 60) > 0.99998
    # spacing ratios follow e^-1/k!: P(1)/P(0) == 1, P(2)/P(1) == 1/2
    p = [ts[0]] + [b - a for a, b in zip(ts, ts[1:])]
    assert abs(p[1] / p[0] - 1.0) < 1e-9
    assert abs(p[2] / p[1] - 0.5) < 1e-9


def test_bootstrap_mean_ci_brackets_point_mean(spark):
    from options_data_pipeline_spark.registry import queries

    row = queries()["bootstrap_mean_ci"](spark, "/root/testdata/sf0.001").first()
    assert row.n_reps == 32
    assert row.boot_lo <= row.boot_hi
    # the 93.75% band should bracket the point estimate comfortably
    assert row.boot_lo <= row.point_mean <= row.boot_hi


def test_compaction_bins_contiguous_and_conserving(spark):
    from options_data_pipeline_spark.registry import queries

    out = queries()["compaction_bins"](spark, "/root/testdata/sf0.001")
    rows = out.orderBy("bin_id").collect()
    # bins partition the day axis contiguously: each bin's first_day
    # follows the previous bin's last_day
    for a, b in zip(rows, rows[1:]):
        assert a.last_day < b.first_day
    # conservation: total rows equal the source day-grain total
    from options_data_pipeline_spark.sources.tables import load_table

    n = (
        load_table(spark, "events", "/root/testdata/sf0.001")
        .filter(F.col("ts").isNotNull())
        .count()
    )
    assert sum(r.n_rows for r in rows) == n
    # every bin except possibly the last holds >= target bytes worth of
    # days only if a single day overflows; running-total binning bounds
    # each bin by target + max(day_bytes)
    assert all(r.n_days >= 1 for r in rows)


def test_seasonal_hour_anomaly_loo_excludes_self(spark):
    # 9 days of small varied counts at hour 3 except one 50-spike:
    # the spike's OWN baseline must not include the 50.
    import datetime

    rows = []
    for d in range(9):
        n = 50 if d == 4 else 4 + (d % 3)
        for i in range(n):
            rows.append(
                (
                    datetime.datetime(2024, 3, 1 + d, 3, 0, i),
                    "tick",
                )
            )
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")

    from options_data_pipeline_spark.registry import queries
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        for t in ("events",):
            df.select(
                F.monotonically_increasing_id().alias("event_id"),
                "ts",
                F.lit(1).cast("long").alias("user_id"),
                "event_type",
                F.lit(1.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            ).write.parquet(os.path.join(tmp, f"{t}.parquet"))
        out = queries()["seasonal_hour_anomaly"](spark, tmp).collect()
    by_day = {r.day_start.day: r for r in out}
    spike = by_day[5]
    # other days: d % 3 pattern -> [4, 5, 6, 4, 6, 4, 5, 6], mean 5.0
    assert spike.loo_mean == pytest.approx(5.0)
    assert spike.is_anomaly
    normal = by_day[1]
    # the spike inflates every OTHER day's baseline mean (and its std,
    # which keeps the normal day's |z| below the alert bar)
    assert normal.loo_mean == pytest.approx((50 + 5 + 6 + 4 + 6 + 4 + 5 + 6) / 8.0)
    assert not normal.is_anomaly


def test_containment_pairs_catches_sub_document(spark):
    from options_data_pipeline_spark.functions.dedupe import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "the quick brown fox jumps over the lazy dog"
    long = (
        "intro boilerplate header section one two three. "
        + short
        + " trailing licence text and much more unrelated content follows here"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "completely different text body")],
        "doc_id long, text string",
    )
    got = {(r.doc_sub, r.doc_sup): r for r in containment_pairs(df).collect()}
    assert (1, 2) in got
    assert got[(1, 2)].containment == 1.0  # every shingle of 1 is in 2
    assert (2, 1) not in got  # asymmetric: the long doc is NOT contained
    assert not any(3 in k for k in got)
    # and Jaccard at the same bar misses it — the reason this op exists
    jac = ngram_jaccard_pairs(df, threshold=0.8).collect()
    assert not any({r.doc_a, r.doc_b} == {1, 2} for r in jac)


def test_containment_winnowed_matches_exact_on_contiguous(spark):
    """The production arm must find every contiguous embedding (the
    winnowing guarantee: a shared normalized run >= fp_k + fp_w - 1 = 31
    chars shares a fingerprint) and verify it with the SAME exact score
    as the audit arm."""
    from options_data_pipeline_spark.functions.dedupe import (
        containment_pairs,
        containment_winnowed,
    )

    short = "the quick brown fox jumps over the lazy dog near the river"
    corpus = [
        (1, short),
        (2, "intro boilerplate header. " + short + " trailing licence text"),
        (3, short + " and a different continuation entirely here"),
        (4, "completely unrelated text body with nothing shared at all"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    exact = {
        (r.doc_sub, r.doc_sup): (r.n_common, r.containment)
        for r in containment_pairs(df).collect()
    }
    win = {
        (r.doc_sub, r.doc_sup): (r.n_common, r.containment)
        for r in containment_winnowed(df).collect()
    }
    # every exact pair here is a contiguous embedding -> full recall,
    # identical exact verification scores, no extra (false) pairs
    assert win == exact
    assert (1, 2) in win and (1, 3) in win
    assert not any(4 in k for k in win)


def test_containment_winnowed_stop_fp_cap_drops_hot_postings(spark):
    """A fingerprint duplicated in more docs than max_df carries no pair
    signal: with max_df below the duplication count the hot posting is
    dropped (no candidates at all), with it raised the pairs return —
    the documented stop-fingerprint recall contract."""
    from options_data_pipeline_spark.functions.dedupe import (
        containment_winnowed,
    )

    text = "identical boilerplate paragraph repeated verbatim in every doc"
    df = spark.createDataFrame(
        [(i, text) for i in range(1, 7)], "doc_id long, text string"
    )
    assert containment_winnowed(df, max_df=5).count() == 0
    assert containment_winnowed(df, max_df=6).count() == 30  # 6*5 directed


# -------------------------------------------------- round-7 batch 4

SF_DIR = "/root/testdata/sf0.001"


def test_join_skew_audit_invariants(spark):
    from __spark_entry__ import queries

    rows = {r.key_name: r for r in
            queries()["join_skew_audit"](spark, SF_DIR).collect()}
    assert set(rows) == {"l_orderkey", "l_partkey", "l_suppkey"}
    for r in rows.values():
        # HHI bounded by [1/n_keys (even), 1 (one key)]; top_share
        # consistent with its own components
        assert 1.0 / r.n_keys <= r.hhi <= 1.0
        assert r.top_share == r.max_df / r.n_rows
        assert r.avg_df == r.n_rows / r.n_keys
    # same fact table, no null keys in TPC-H lineitem → equal n_rows
    assert len({r.n_rows for r in rows.values()}) == 1
    # orderkey is the high-cardinality key: lowest concentration
    assert rows["l_orderkey"].hhi < rows["l_suppkey"].hhi


def test_embedding_int8_quantize_error_bound(spark):
    from __spark_entry__ import queries

    out = queries()["embedding_int8_quantize"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dims = emb.selectExpr("posexplode(embedding) AS (d, x)")
    rng = dims.groupBy("d").agg(
        (F.max(F.col("x").cast("double")) - F.min(F.col("x").cast("double"))).alias("r")
    )
    max_range = rng.agg(F.max("r")).collect()[0][0]
    # quantization error is at most half a step of the widest dimension
    assert all(r.max_abs_err <= max_range / 510.0 * (1 + 1e-9) for r in out)
    assert all(
        0 <= int(v) <= 255 for r in out for v in r.qvec_csv.split(",")
    )
    assert len(out) == emb.count()


def test_weighted_bernoulli_sample_deterministic(spark):
    from __spark_entry__ import queries

    q = queries()["weighted_bernoulli_sample"]
    a = sorted(r.doc_id for r in q(spark, SF_DIR).collect())
    b = sorted(r.doc_id for r in q(spark, SF_DIR).collect())
    assert a == b and len(a) > 0  # pure function of the data
    rows = q(spark, SF_DIR).collect()
    assert all(0.0 < r.p_keep <= 1.0 for r in rows)
    # heavy docs (p_keep == 1) are ALWAYS kept: every doc whose weight
    # clears the always-keep bar must appear in the sample
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from options_data_pipeline_spark.functions.text import token_count_col
    w = docs.select("doc_id", token_count_col().alias("w"))
    w_total = w.agg(F.sum("w")).collect()[0][0]
    heavy = {r.doc_id for r in w.filter(F.col("w") * 500 >= w_total).collect()}
    assert heavy <= set(a)


def test_chi2_drift_invariants(spark):
    from __spark_entry__ import queries

    rows = queries()["chi2_drift"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_bins <= 8
        if r.chi2 is not None:
            assert r.chi2 >= 0.0
            if r.n_bins > 1:
                assert r.chi2_per_dof == r.chi2 / (r.n_bins - 1)


def test_part_entity_resolution_cluster_contract(spark):
    from __spark_entry__ import queries

    rows = queries()["part_entity_resolution"](spark, SF_DIR).collect()
    assert rows
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r.entity_id, []).append(r)
    for eid, members in by_entity.items():
        # the entity id is the min member (the survivor rule) and the
        # advertised cluster_size is the actual member count
        assert eid == min(m.p_partkey for m in members)
        assert all(m.cluster_size == len(members) for m in members)
        assert len(members) >= 2  # singletons never entered the graph


def test_mad_outlier_audit_invariants(spark):
    from __spark_entry__ import queries

    rows = queries()["mad_outlier_audit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0.0
        assert r.outlier_frac == r.n_outliers / r.n_events
        # the robust fence flags a minority by construction on any
        # non-degenerate distribution
        assert r.n_outliers < r.n_events / 2


def test_mad_outliers_robust_to_heavy_tail(spark):
    """The defining property vs the mean/std fence: one absurd value
    must not move the median/MAD fence enough to hide ITSELF."""
    from __spark_entry__ import queries  # noqa: F401  (shape reference)
    import os, tempfile

    vals = [float(v) for v in range(100)] + [1e12]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, "t", vals[i]) for i in range(len(vals))],
            "event_id long, event_type string, value double",
        ).withColumn("ts", F.current_timestamp()).withColumn(
            "user_id", F.lit(1)
        ).withColumn("props", F.lit("{}")).write.parquet(
            os.path.join(tmp, "events.parquet")
        )
        row = queries()["mad_outlier_audit"](spark, tmp).first()
    assert row.median_value == 50.0 and row.n_outliers == 1


def test_feature_correlations_bounds(spark):
    from __spark_entry__ import queries

    rows = queries()["feature_correlations"](spark, SF_DIR).collect()
    assert len(rows) == 3
    assert all(-1.0 <= r.pearson_r <= 1.0 for r in rows)
    # the synthetic columns are drawn independently — every |r| is weak
    # (a strong correlation here would mean the op is broken)
    assert all(abs(r.pearson_r) < 0.2 for r in rows)


def test_discount_elasticity_shapes(spark):
    from __spark_entry__ import queries

    rows = queries()["discount_elasticity"](spark, SF_DIR).collect()
    assert len(rows) == 25  # every TPC-H brand regressed independently
    assert all(0.0 <= r.r2 <= 1.0 for r in rows if r.r2 is not None)


def test_split_leakage_audit_accounts_for_every_pair(spark):
    from __spark_entry__ import queries
    from options_data_pipeline_spark.functions.dedupe import (
        minhash_lsh_candidates,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    rows = queries()["split_leakage_audit"](spark, SF_DIR).collect()
    total = sum(r.n_pairs for r in rows)
    assert total == minhash_lsh_candidates(
        load_table(spark, "documents", SF_DIR)
    ).count()
    for r in rows:
        assert r.is_leak == (r.split_lo != r.split_hi)


def test_hll_segment_rollup_merge_is_lossless(spark):
    from __spark_entry__ import queries

    rows = queries()["hll_segment_rollup"](spark, SF_DIR).collect()
    assert rows
    # the theorem under test: register-wise MAX over day segments
    # reproduces the whole-period registers exactly, for every symbol
    assert all(r.merge_exact for r in rows)
    assert all(r.hll_merged == r.hll_direct for r in rows)
    # raw m=64 HLL has NO small-range correction (documented in
    # hll_distinct_sketch) — at sf0.001 cardinalities only sanity-band it
    assert all(0.2 < r.est_ratio < 5.0 for r in rows)
    assert all(r.est_ratio == r.hll_merged / r.n_exact for r in rows)


def test_knn_label_noise_flags_planted_mislabel(spark):
    """Six near-identical vectors, one carrying the wrong label: the
    odd one's whole neighborhood disagrees (flagged); the majority's
    neighborhoods mostly agree (not flagged)."""
    from __spark_entry__ import queries
    import os, tempfile

    base = [1.0] + [0.0] * 63
    rows = []
    for i in range(6):
        vec = list(base)
        vec[1] = 0.001 * i  # near-identical, not byte-identical
        rows.append((i, vec, 2 if i == 5 else 1))
    far = [0.0] * 63 + [1.0]
    rows += [(10 + i, far, 3) for i in range(2)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(os.path.join(tmp, "embeddings.parquet"))
        out = {r.vec_id: r for r in
               queries()["knn_label_noise"](spark, tmp).collect()}
    # vec 5: all 5 neighbors carry label 1 ≠ 2 → fully disagreeing
    assert out[5].n_disagree == out[5].n_neighbors and out[5].is_noisy
    # the correctly-labeled majority: exactly one disagreeing neighbor
    for i in range(5):
        assert out[i].n_disagree == 1 and not out[i].is_noisy


def test_tv_distance_matrix_properties(spark):
    from __spark_entry__ import queries

    rows = queries()["tv_distance_matrix"](spark, SF_DIR).collect()
    # 5 event types -> C(5,2) unordered pairs, each distance in [0, 1]
    assert len(rows) == 10
    assert all(0.0 <= r.tv_distance <= 1.0 for r in rows)
    assert all(r.type_a < r.type_b for r in rows)


def test_half_life_engagement_dyadic_decay(spark):
    """Hand-checkable decay: one user, value 8 today and 8 yesterday →
    score 8 + 8/2 = 12; n_events accounted."""
    from __spark_entry__ import queries
    import datetime, os, tempfile

    t0 = datetime.datetime(2024, 5, 10, 12, 0, 0)
    rows = [
        (1, 100, "click", t0, 8.0),
        (2, 100, "click", t0 - datetime.timedelta(days=1), 8.0),
        (3, 200, "view", t0, 3.0),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string,"
            " ts timestamp, value double",
        ).withColumn("props", F.lit("{}")).write.parquet(
            os.path.join(tmp, "events.parquet")
        )
        out = {r.user_id: r for r in
               queries()["half_life_engagement"](spark, tmp).collect()}
    assert out[100].decayed_score == 12.0 and out[100].n_events == 2
    assert out[200].decayed_score == 3.0


def test_wilson_bands_bracket_ctr_and_stay_in_unit_interval(spark):
    from __spark_entry__ import queries

    rows = queries()["wilson_ctr_bands"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.ctr <= r.wilson_hi <= 1.0
        # band width shrinks with volume: a day with more traffic than
        # another must not have a (much) wider band — sanity, not exact
        assert r.wilson_hi - r.wilson_lo < 1.0


def test_winsorized_mean_tames_planted_whale(spark):
    from __spark_entry__ import queries
    import datetime, os, tempfile

    t0 = datetime.datetime(2024, 5, 1)
    vals = [float(v) for v in range(100)] + [1e9]
    rows = [
        (i, 1, "t", t0 + datetime.timedelta(minutes=i), vals[i])
        for i in range(len(vals))
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string,"
            " ts timestamp, value double",
        ).withColumn("props", F.lit("{}")).write.parquet(
            os.path.join(tmp, "events.parquet")
        )
        r = queries()["winsorized_stats"](spark, tmp).first()
    # raw mean would be ~9.9e6; the clipped mean stays at data scale
    assert r.winsorized_mean < 200
    assert r.n_clipped_hi == 1 and r.n_events == 101


def test_abc_classification_partitions_revenue(spark):
    from __spark_entry__ import queries

    rows = queries()["abc_classification"](spark, SF_DIR).collect()
    assert rows
    # classes are contiguous in cumulative share
    a = [r.cum_share for r in rows if r.abc_class == "A"]
    b = [r.cum_share for r in rows if r.abc_class == "B"]
    c = [r.cum_share for r in rows if r.abc_class == "C"]
    assert a and b and c
    assert max(a) <= 0.7 < min(b) and max(b) <= 0.9 < min(c)
    # class-A parts each carry at least as much revenue as any class-C
    # part (the synthetic revenue is near-uniform, so class SIZES track
    # the share thresholds rather than a Pareto head/tail split)
    assert min(r.revenue for r in rows if r.abc_class == "A") >= max(
        r.revenue for r in rows if r.abc_class == "C"
    )
    # cumulative share reaches ~1 at the last part
    assert abs(max(r.cum_share for r in rows) - 1.0) < 1e-9


def test_neyman_sample_oversamples_volatile_strata(spark):
    from __spark_entry__ import queries

    rows = queries()["neyman_stratified_sample"](spark, SF_DIR).collect()
    assert rows
    assert all(0.0 < r.keep_rate <= 1.0 for r in rows)
    # determinism: second run identical
    again = queries()["neyman_stratified_sample"](spark, SF_DIR).collect()
    assert sorted(r.event_id for r in rows) == sorted(
        r.event_id for r in again
    )
    # rates are per-stratum constants ordered by stratum volatility
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, set()).add(r.keep_rate)
    assert all(len(v) == 1 for v in by_type.values())
