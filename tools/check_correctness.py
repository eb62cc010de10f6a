"""Local pre-validation harness mimicking the driver's t2 correctness gate.

For every query in the registry: run the Spark query and the DuckDB oracle
at the given sf dir, then compare row count, schema (column names sorted),
and an order-insensitive value hash. Reports per-query PASS/FAIL with the
first differing rows on failure.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --sf01-subset

The ``--sf01-subset`` mode runs the SCALE-SENSITIVE queries (samplers,
sketches, LSH thresholds, k-means seeds, quantizers — anything whose
semantics could drift with data volume while staying green at the gate's
sf0.01) against sf0.1 and writes a separate CORRECTNESS_sf01.json
artifact (never touches the committed sf0.01 report).
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import pandas as pd

#: queries whose values depend on data-volume-sensitive machinery:
#: hash thresholds and band occupancy (LSH/simhash/winnowing), seeded
#: k-means/PQ codebooks, reservoir/temperature/stratified samplers,
#: distribution-shape statistics (zipf, entropy, drift), and the
#: recall audits that compose them. A volume-driven semantic drift
#: (band saturation, seed collision, quantile shift) shows up here
#: first; the plain correctness gate runs only at sf0.01.
SF01_SUBSET = [
    "near_dup_threshold_sweep",  # r11: LSH-estimate policy curve
    "near_dup_threshold_sweep_indexed",  # r11: same curve, store-served
    "cluster_aware_splits",  # r11: label-grain splits over the LSH graph
    "ks_drift_sources",  # r11: distribution-shape stat (CDF grid)
    "minhash_jaccard_estimate",
    "minhash_lsh",
    "rp_lsh_near_dup",
    "simhash_near_pairs",
    "winnow_fingerprints",
    "winnow_overlap",
    "dedup_canonical",
    "ivf_kmeans_topk",
    "ivf_fixed_topk",
    "ivf_multiprobe_topk",
    "ivf_cell_balance",
    "pq_quantize",
    "pq_adc_topk",
    "ann_recall_report",
    "semdedup_prune",
    "kcenter_coreset",
    "weighted_sample",
    "stratified_sample",
    "budget_sample",
    "dsir_weights",
    "temperature_mixture",
    "zipf_slope",
    "lang_id",
    "embedding_drift",
    # round 6: Bloom saturation is exactly a data-volume effect — the
    # fill ratio (and thus every verdict) shifts with corpus size
    "bloom_prefilter_stats",
    # Count-Min collision mass is the same volume effect: buckets
    # saturate as distinct items grow, shifting every estimate
    "cms_heavy_hitters",
    # HLL register saturation is the same distinct-volume effect
    "hll_distinct_sketch",
    # k-core peel DEPTH grows with graph density (4 rounds at sf0.01,
    # 6 at sf0.1) — verifies the 8-round oracle unroll still brackets it
    "part_kcore",
    # bin width and occupancy follow the global min/max and row volume
    "histogram_quantile_sketch",
    # bottom-k sketches leave the exact branch (n < k) only at volume;
    # estimation-mode arithmetic is only exercised at the bigger SF
    "kmv_overlap_estimate",
    # round 7: the MMR pool (cosine top-16) recomposes with corpus
    # volume, reshuffling the whole greedy trajectory
    "mmr_diversified_topk",
    # wedge/adjacency density (and thus the candidate set) is a pure
    # volume effect on the repeat co-purchase graph
    "adamic_adar_links",
    # round 7 cont.: winnow-fp document frequencies cross the stop-fp
    # cap only at volume (sf0.01 has zero capped fps at k=24)
    "containment_winnowed",
    # recall itself is the volume-sensitive number (1.0 -> 0.9046)
    "containment_recall_audit",
    # LSH-candidate density across splits is a duplication-volume effect
    "split_leakage_audit",
    # content-cell occupancy (and thus each vector's neighbor pool)
    # grows with corpus volume
    "knn_label_noise",
    # day-segment register saturation is the distinct-volume effect
    "hll_segment_rollup",
    # blocking-key posting density drives the candidate set
    "part_entity_resolution",
    # exact percentile interpolation indices shift with row volume
    "mad_outlier_audit",
    "winsorized_stats",
    # cumulative-share boundaries (and bucket occupancy) move with volume
    "abc_classification",
    # round 8: the GD trajectory is a function of the corpus (every
    # gradient sum shifts with volume), and the recluster verdicts are
    # occupancy-share comparisons
    "quality_train_score",
    "ivf_recluster_audit",
    "entity_blocking_audit",
    # holdout metrics and chunk-boundary density both shift with volume
    "quality_holdout_eval",
    "content_chunk_dedup",
    # backoff-branch frequency is a pure LM-coverage (volume) effect
    "backoff_heldout_logprob",
    # round 9: the flagged set, the seed ranking, and every Lloyd-step
    # mean are functions of corpus occupancy — the whole repair
    # trajectory recomposes with volume
    "ivf_recluster_repair",
    # cut boundaries are a pure cross-doc-duplication (volume) effect
    "substring_cut_list",
    # the mixture trajectory is a function of every domain's unigram
    # distribution — vocab coverage (and thus every KL) shifts with volume
    "doremi_mixture_weights",
    # kept text recomposes with the cut boundaries (volume effect above)
    "substring_dedup_apply",
    # rates inherit the mixture trajectory's volume sensitivity
    "doremi_mixture_sample",
    # batch-vs-corpus duplication is a pure volume effect
    "substring_cut_list_incremental",
    # both arms' rankings (and thus the fused top list) shift with corpus
    "hybrid_rrf_retrieval",
    # train×eval gram collisions are a pure volume effect
    "decontamination_cut_list",
    # round 10: same volume sensitivity as substring_cut_list (identical
    # semantics, skew-robust plan)
    "substring_cut_list_skew_robust",
    # train×eval collisions recomposed from the stored positioned index
    "decontamination_cut_list_indexed",
    # stored-stats BM25: df/avgdl (and thus every score and rank) shift
    # with corpus volume, served or recomputed
    "bm25_rank_indexed",
    "hybrid_rrf_retrieval_indexed",
    # kept text recomposes with the eval-collision cut boundaries
    "decontamination_apply",
    # cluster membership (and thus every merged label) shifts with volume
    "dedup_clusters_incremental",
    # the keep rule inherits the merged labels' volume sensitivity
    "dedup_canonical_incremental",
    # ratio/size stats are pure volume effects over the merged labels
    "dedup_cluster_stats",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_extension_array_dtype(df[c]):
            df[c] = df[c].astype(object)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cell_repr(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    rows = ["\x1f".join(cell_repr(v) for v in row) for row in df.itertuples(index=False)]
    for r in sorted(rows):
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf01_mode = "--sf01-subset" in sys.argv[1:]
    sf01_full = "--sf01-full" in sys.argv[1:]
    if sf01_full:
        # VERDICT r10 item 5: the FULL registry at sf0.1 (not just the
        # curated scale-sensitive subset) — promotes "judged
        # volume-insensitive" to "measured" for every query. Writes its
        # own artifact; never touches CORRECTNESS_local.json (sf0.01) or
        # CORRECTNESS_sf01.json (the per-round drift subset).
        sf_dir = "/root/testdata/sf0.1"
        only = set()
    elif sf01_mode:
        sf_dir = "/root/testdata/sf0.1"
        only = set(SF01_SUBSET)
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
        only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from options_data_pipeline_spark import registry
    from options_data_pipeline_spark.session import get_spark

    spark = get_spark("correctness-check")
    if not only:
        # t1-style smoke: entry() must run and return rows with a schema
        smoke = entry_mod.entry(spark)
        n = smoke.count()
        print(f"SMOKE entry(): {n} rows, schema {smoke.schema.simpleString()[:80]}...")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = registry.queries(), registry.oracle_sql()
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"status": "spark_error", "error": str(e)[:200]}
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            results[name] = {"status": "rows_only", "rows": len(sdf)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        s, o = normalize(sdf), normalize(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rowcount spark={len(s)} oracle={len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"columns spark={list(s.columns)} oracle={list(o.columns)}")
        elif value_hash(s) != value_hash(o):
            problems.append("value-hash mismatch")
            merged = s.merge(o, how="outer", indicator=True, on=list(s.columns))
            diff = merged[merged["_merge"] != "both"]
            problems.append(f"first diffs:\n{diff.head(6)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
            failures.append(name)
            results[name] = {"status": "mismatch", "detail": str(problems[0])[:200]}
        else:
            print(f"PASS {name} ({len(s)} rows)")
            results[name] = {"status": "match", "rows": len(s)}
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    import json
    import os

    if sf01_full:
        with open("CORRECTNESS_sf01_full.json", "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        spark.stop()
        return 1 if failures else 0

    if sf01_mode:
        # separate artifact: the sf0.1 drift sweep never collides with
        # the committed sf0.01 report
        with open("CORRECTNESS_sf01.json", "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        spark.stop()
        return 1 if failures else 0

    # CORRECTNESS_local.json is a COMMITTED round artifact holding the
    # last FULL sf0.01 sweep. Subset runs at the same sf merge into it;
    # subset runs at a DIFFERENT sf (per-query validation during
    # development) must not touch it — a cross-sf subset used to clobber
    # the committed 100+-row report down to the few names it checked.
    if only and os.path.exists("CORRECTNESS_local.json"):
        try:
            with open("CORRECTNESS_local.json") as f:
                prior = json.load(f)
            if prior.get("sf_dir") == sf_dir:
                results = {**prior.get("results", {}), **results}
            else:
                spark.stop()
                return 1 if failures else 0
        except (json.JSONDecodeError, OSError):
            # fail CLOSED: if the committed artifact can't be read we can't
            # prove this subset ran at the same sf, so never overwrite the
            # full report with a few rows — skip the write entirely
            print(
                "CORRECTNESS_local.json unreadable; subset run NOT merged "
                "(fix or regenerate with a full sweep)"
            )
            spark.stop()
            return 1 if failures else 0
    with open("CORRECTNESS_local.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
