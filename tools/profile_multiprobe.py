"""Attribute the r3 ivf_multiprobe_topk bench regression (VERDICT item 2).

Times query CONSTRUCTION (Python Column-tree building, py4j) separately
from EXECUTION (noop write) for ivf_fixed_topk vs ivf_multiprobe_topk,
plus the r2 self-join form of multiprobe, all under the r3 min-of-2 timer.

Usage: python tools/profile_multiprobe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from options_data_pipeline_spark import registry
from options_data_pipeline_spark.session import get_spark
from options_data_pipeline_spark.functions.similarity import (
    assign_cells,
    centroid_top_cells,
    cosine_topk_partitioned,
    fixed_centroids,
    with_cell,
)


def q_multiprobe_r2(spark, sf_dir):
    emb = registry.load_table(spark, "embeddings", sf_dir)
    cents = fixed_centroids(8, 64)
    corpus = emb.join(
        assign_cells(emb, cents).withColumnRenamed("vid", "vec_id"), "vec_id"
    )
    qprobe = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            "vec_id",
            "embedding",
            centroid_top_cells("embedding", cents, 2).alias("probes"),
        )
        .select("vec_id", "embedding", F.explode("probes").alias("cell"))
    )
    return cosine_topk_partitioned(qprobe, corpus, k=5, cell_col="cell")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile")
    qs = registry.queries()
    qs["buffer_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    cases = {
        "ivf_fixed_topk": qs["ivf_fixed_topk"],
        "ivf_multiprobe_topk": qs["ivf_multiprobe_topk"],
        "multiprobe_r2_selfjoin": q_multiprobe_r2,
    }
    for name, fn in cases.items():
        best_c = best_e = best_t = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            c, e, t = t1 - t0, t2 - t1, t2 - t0
            best_c = c if best_c is None or c < best_c else best_c
            best_e = e if best_e is None or e < best_e else best_e
            best_t = t if best_t is None or t < best_t else best_t
        print(
            f"{name:26s} construct={best_c:6.3f}s exec={best_e:6.3f}s total={best_t:6.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
