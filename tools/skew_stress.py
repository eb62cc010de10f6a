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
    else:
        main()
