"""Planted-skew stresses.

1. Giant-basket skew for the co-purchase edge build: append ONE
synthetic degenerate mega-order (10k distinct parts in a single
l_orderkey) to sf0.1's lineitem and run the graph family on top.

Without the basket cap (`registry._COPURCHASE_BASKET_CAP`), that single
order contributes C(10k,2) ≈ 5×10⁷ pairs to ONE join key's task (at a
100 TB-realistic 100k-line order: ~5×10⁹ — a guaranteed straggler/OOM).
With the cap, the order contributes C(64,2) = 2016 pairs like any other
large basket, and the audit query reports exactly what was dropped.

Usage: python tools/skew_stress.py [basket_size] [query ...]
Prints one JSON line with the audit row and per-query seconds.

2. Mega-boilerplate skew for the substring cut list's dup-detection
stage: plant a synthetic gram-grain table — ONE boilerplate gram held
by N docs plus N unique background grams — and time the two REAL
detection paths of `span_cut_list` (`_dup_positions_window` vs
`_dup_positions_agg_join`) through the island merge. The stage is
stressed in ISOLATION because in an end-to-end run the tokenize+md5
gram build (flat, 32-way parallel) dominates wall time locally and
masks the straggler; at 100 TB the hot partition is 10⁸ rows and the
masking inverts. The window path puts all N mega rows on one
un-splittable task; the agg+join path partial-aggregates the mega key
map-side and lets AQE's OptimizeSkewedJoin split the probe partition —
the run lowers the skew thresholds (8 MB / factor 2) to trigger at
local scale what the default 256 MB threshold triggers on a cluster.
Both paths' cut outputs are checked identical (pure optimization; the
registry twin `substring_cut_list_skew_robust` hash-checks equivalence
on real text against the shared oracle).

Usage: python tools/skew_stress.py --boilerplate [n_docs ...]
Prints one JSON line with per-size timings for both paths.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from options_data_pipeline_spark import registry  # noqa: E402
from options_data_pipeline_spark.session import get_spark  # noqa: E402
from options_data_pipeline_spark.sources.tables import load_table  # noqa: E402


def boilerplate_main() -> None:
    sizes = [int(a) for a in sys.argv[2:]] or [2_000_000, 8_000_000]
    from options_data_pipeline_spark.functions.text import (
        _dup_positions_agg_join,
        _dup_positions_window,
        merge_covered_positions,
    )

    spark = get_spark("skew-stress-boilerplate")
    # simulate the cluster's 256 MB skew trigger at local row volumes
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    report: dict[str, dict] = {}
    try:
        for n in sizes:
            # gram-grain plant: gram_key 0 is the mega-boilerplate gram
            # (held once by each of n docs, at position 3), every other
            # row a unique background gram — so the window path's
            # gram_key=0 partition is n rows on one task, while the
            # agg+join path partial-collapses it map-side and splits
            # the probe.
            mega = spark.range(n).select(
                F.lit(0).alias("gram_key"),
                F.col("id").alias("doc_id"),
                F.array(F.lit(3)).cast("array<int>").alias("ps"),
            )
            bg = spark.range(n).select(
                (F.col("id") + 1).alias("gram_key"),
                F.col("id").alias("doc_id"),
                F.array(F.lit(20)).cast("array<int>").alias("ps"),
            )
            gd = mega.unionByName(bg).repartition(32).localCheckpoint(eager=True)
            row = {}
            sums = {}
            for label, detect in (
                ("window_path", _dup_positions_window),
                ("agg_join_path", _dup_positions_agg_join),
            ):
                times = []
                for i in range(3):  # run 0 = warmup, record min of 2
                    t0 = time.perf_counter()
                    cuts = merge_covered_positions(detect(gd), 8)
                    agg = cuts.agg(
                        F.count(F.lit(1)).alias("n_cuts"),
                        F.sum("n_tokens").alias("cut_tokens"),
                    ).collect()[0]
                    times.append(time.perf_counter() - t0)
                row[label] = round(min(times[1:]), 3)
                sums[label] = (agg["n_cuts"], agg["cut_tokens"])
            assert sums["window_path"] == sums["agg_join_path"], sums
            assert sums["window_path"][0] == n  # one cut per mega-holder doc
            report[str(n)] = row
        print(json.dumps({"mega_gram_holders": sizes, "sizes": report}))
    finally:
        spark.stop()


def template_main() -> None:
    """Planted template-cluster skew for the near-dup band joins
    (VERDICT r11 item 1): N background docs with unique texts plus T
    docs sharing ONE boilerplate template (T defaults to 1% of N — the
    boilerplate-heavy-corpus scenario). Every template doc lands in the
    SAME band bucket in all bands, so the plain (band, bucket) self-join
    puts all C(T,2) candidate pairs on one join key → one task, and AQE
    cannot split it (both sides of the self-join carry the same giant
    partition). Measures, for minhash_lsh and simhash pair generation:

     - ``worst_key_share``: max over join keys of that key's pair count
       over total pairs — computed exactly from bucket sizes (plain:
       C(B,2) per (band,bucket); robust: per-block c_i*c_j for heavy
       buckets after the salt split);
     - wall seconds for a full count() of the candidate set, plain vs
       ``skew_robust=True``;
     - parity (plain count == robust count; pair-set equality is pinned
       by tests + the registry twins' shared oracle).

    Usage: python tools/skew_stress.py --template [n_docs] [n_template]
    """
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    t = int(sys.argv[3]) if len(sys.argv) > 3 else max(n // 100, 2)
    from options_data_pipeline_spark.functions.dedupe import (
        SKEW_HEAVY_BUCKET,
        SKEW_SALT,
        minhash_lsh_candidates,
        minhash_signatures_wide,
        band_bucket_cols,
        simhash_near_pairs,
        simhash_signatures,
        LSH_BANDS,
    )

    spark = get_spark("skew-stress-template")
    # background docs get near-disjoint token sets (six md5 words each) so
    # their signatures spread uniformly — the skew under test is the
    # PLANTED template, not an artifact of look-alike synthetic prose
    bg = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(s)))
                for s in "abcdef"
            ],
        ).alias("text"),
    )
    tmpl = spark.range(t).select(
        (F.col("id") + n).alias("doc_id"),
        F.lit(
            "standard boilerplate legal disclaimer template shared verbatim "
            "across the corpus by every scraped page of this site"
        ).alias("text"),
    )
    docs = bg.unionByName(tmpl).repartition(32).localCheckpoint(eager=True)

    def worst_share(banded, keys):
        """Exact worst-join-key pair share for the plain self-join and
        for the blocked heavy-bucket variant, from bucket/block sizes."""
        sizes = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("b")).cache()
        tot, worst_plain = sizes.select(
            F.sum(F.col("b") * (F.col("b") - 1) / 2),
            F.max(F.col("b") * (F.col("b") - 1) / 2),
        ).first()
        heavy = sizes.filter(F.col("b") >= SKEW_HEAVY_BUCKET)
        light_worst = (
            sizes.filter(F.col("b") < SKEW_HEAVY_BUCKET)
            .agg(F.max(F.col("b") * (F.col("b") - 1) / 2))
            .first()[0]
            or 0.0
        )
        blk = (
            banded.join(F.broadcast(heavy.select(*keys)), keys, "left_semi")
            .withColumn("_g", F.pmod(F.hash("doc_id"), F.lit(SKEW_SALT)))
            .groupBy(*keys, "_g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(*keys)
            .agg(F.max("c").alias("cmax"))
            .agg(F.max(F.col("cmax") * F.col("cmax")))
            .first()[0]
            or 0.0
        )
        sizes.unpersist()
        return {
            "total_pairs": float(tot),
            "worst_key_share_plain": float(worst_plain) / float(tot),
            "worst_key_share_robust": max(light_worst, blk) / float(tot),
        }

    report = {}
    # minhash banding (same expressions as the generator)
    wide = minhash_signatures_wide(docs)
    stack_args = ", ".join(f"{b}, b{b}" for b in range(LSH_BANDS))
    mh_banded = wide.select("doc_id", *band_bucket_cols()).selectExpr(
        "doc_id", f"stack({LSH_BANDS}, {stack_args}) as (band, bucket)"
    )
    report["minhash_lsh"] = worst_share(mh_banded, ["band", "bucket"])
    for label, kw in (("plain", {}), ("robust", {"skew_robust": True})):
        t0 = time.perf_counter()
        c = minhash_lsh_candidates(docs, **kw).count()
        report["minhash_lsh"][f"{label}_sec"] = round(time.perf_counter() - t0, 2)
        report["minhash_lsh"][f"{label}_pairs"] = c
    # simhash banding (bits=62 default)
    sig = simhash_signatures(docs, bits=62)
    nb, width = 4, 62 // 4
    bexprs = []
    for i in range(nb):
        lo = i * width
        w = width if i < nb - 1 else 62 - lo
        bexprs.append(
            F.shiftright(F.col("simhash"), lo)
            .bitwiseAND(F.lit((1 << w) - 1))
            .alias(f"v{i}")
        )
    sh_banded = sig.select("doc_id", *bexprs).selectExpr(
        "doc_id", f"stack({nb}, " + ", ".join(f"{i}, v{i}" for i in range(nb)) + ") as (band, bval)"
    )
    report["simhash"] = worst_share(sh_banded, ["band", "bval"])
    for label, kw in (("plain", {}), ("robust", {"skew_robust": True})):
        t0 = time.perf_counter()
        c = simhash_near_pairs(docs, **kw).count()
        report["simhash"][f"{label}_sec"] = round(time.perf_counter() - t0, 2)
        report["simhash"][f"{label}_pairs"] = c
    for fam in report.values():
        assert fam["plain_pairs"] == fam["robust_pairs"], fam
    print(
        json.dumps(
            {
                "n_docs": n,
                "n_template": t,
                "heavy_bucket": SKEW_HEAVY_BUCKET,
                "salt": SKEW_SALT,
                "families": report,
            }
        )
    )
    spark.stop()


def main() -> None:
    basket = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    names = sys.argv[2:] or [
        "copurchase_basket_audit",
        "part_triangle_counts",
        "part_kcore",
        "part_communities_lpa",
    ]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-stress")
    out = tempfile.mkdtemp(prefix=f"skew_stress_b{basket}_")
    try:
        li = load_table(spark, "lineitem", src)
        mega_key = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
        # one degenerate order: `basket` distinct parts, minimal other cols
        mega = (
            spark.range(basket)
            .select(
                F.lit(mega_key).alias("l_orderkey"),
                (F.col("id") + 1).alias("l_partkey"),
            )
        )
        filler = {
            c: F.lit(None).cast(t)
            for c, t in li.dtypes
            if c not in ("l_orderkey", "l_partkey")
        }
        mega = mega.withColumns(filler).select(li.columns)
        li.unionByName(mega).write.parquet(os.path.join(out, "lineitem.parquet"))
        for f in os.listdir(src):
            dst = os.path.join(out, f)
            if f.endswith(".parquet") and not os.path.exists(dst):
                s = os.path.join(src, f)
                (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, dst)

        qs = registry.queries()
        timings: dict[str, float] = {}
        audit = None
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, out)
            if name == "copurchase_basket_audit":
                audit = {k: v for k, v in df.collect()[0].asDict().items()}
            else:
                df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "mega_basket": basket,
                    "audit": audit,
                    "queries": timings,
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--boilerplate":
        boilerplate_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--template":
        template_main()
    else:
        main()
