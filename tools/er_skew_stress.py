"""Hot-key skew stress for the two-tier entity-resolution build — the
(brand, token) analogue of the giant-basket probe in skew_stress.py,
closing the round-7 verdict's watch item on part_entity_resolution.

Two degenerate injections, each appended to sf0.1's part table:

* ``identity``: N extra parts under ONE brand with the SAME name —
  one identity class of size N+ . Tier 1 (star edges around the class
  rep) keeps this linear: N star edges, ONE extra class rep, rep-grain
  df +1. The pre-round-8 part-grain blocking would have put C(N,2)
  candidate pairs on one (brand, token) join key (N=10k → 5×10⁷ pairs
  in one task; 100k → 5×10⁹, a guaranteed straggler/OOM).
* ``hottoken``: N extra parts under ONE brand whose names share one
  hot token but are otherwise unique — N distinct signatures, so the
  rep-grain posting df on that key becomes ~N. The df <= 64 stop-key
  cap drops the key (bounded candidates); entity_blocking_audit
  reports the fire (n_capped_keys/postings_dropped) so the recall
  spend is visible, exactly the copurchase_basket_audit contract.

Usage: python tools/er_skew_stress.py [n_parts] [identity|hottoken|both]
Prints one JSON line: per-mode audit row (hottest brand) + seconds.
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


def _run_mode(spark, src: str, n: int, mode: str) -> dict:
    part = load_table(spark, "part", src)
    base = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    if mode == "identity":
        name = F.lit("stress identical duplicate catalog entry")
    else:  # hottoken: shared hot token + a unique discriminator token
        name = F.concat(F.lit("stresshot uniq"), F.col("id").cast("string"))
    extra = spark.range(n).select(
        (F.col("id") + base).alias("p_partkey"),
        name.alias("p_name"),
        F.lit("Brand#00").alias("p_brand"),
    )
    filler = {
        c: F.lit(None).cast(t)
        for c, t in part.dtypes
        if c not in ("p_partkey", "p_name", "p_brand")
    }
    extra = extra.withColumns(filler).select(part.columns)
    out = tempfile.mkdtemp(prefix=f"er_skew_{mode}_{n}_")
    try:
        part.unionByName(extra).write.parquet(os.path.join(out, "part.parquet"))
        for f in os.listdir(src):
            dst = os.path.join(out, f)
            if f.endswith(".parquet") and not os.path.exists(dst):
                s = os.path.join(src, f)
                (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, dst)
        qs = registry.queries()
        t0 = time.perf_counter()
        n_resolved = qs["part_entity_resolution"](spark, out).count()
        er_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        audit_rows = qs["entity_blocking_audit"](spark, out).collect()
        audit_sec = round(time.perf_counter() - t0, 3)
        hot = max(audit_rows, key=lambda r: (r.n_capped_keys, r.max_class_size))
        return {
            "mode": mode,
            "n_injected": n,
            "n_resolved": n_resolved,
            "er_sec": er_sec,
            "audit_sec": audit_sec,
            "hot_brand_audit": hot.asDict(),
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("er-skew-stress")
    try:
        modes = ["identity", "hottoken"] if which == "both" else [which]
        print(json.dumps({"results": [_run_mode(spark, src, n, m) for m in modes]}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
