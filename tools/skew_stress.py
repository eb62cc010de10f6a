"""Giant-basket skew stress for the co-purchase edge build: append ONE
synthetic degenerate mega-order (10k distinct parts in a single
l_orderkey) to sf0.1's lineitem and run the graph family on top.

Without the basket cap (`registry._COPURCHASE_BASKET_CAP`), that single
order contributes C(10k,2) ≈ 5×10⁷ pairs to ONE join key's task (at a
100 TB-realistic 100k-line order: ~5×10⁹ — a guaranteed straggler/OOM).
With the cap, the order contributes C(64,2) = 2016 pairs like any other
large basket, and the audit query reports exactly what was dropped.

Usage: python tools/skew_stress.py [basket_size] [query ...]
Prints one JSON line with the audit row and per-query seconds.
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
    main()
