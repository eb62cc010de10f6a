"""×N BASE+DELTA serving probe — the scale evidence for the
merge-on-read fact store (streaming/bucketed_stream.py).

What it measures at factor N (lineitem ×N, orders ×N):
 - ``base_build_s``: the one-time bucketed write of the 90% base;
 - ``ingest_s``: the exactly-once manifest append of the 10% "stream";
 - ``serve_mor_s``: revenue agg through `serve_join` — the bucketed SMJ
   arm (no Exchange below the join) + the delta tail arm;
 - ``serve_monolithic_s``: the same agg as a plain parquet join — what
   every run pays WITHOUT the store (both fact sides re-shuffle);
 - ``compact_s`` then ``serve_post_compact_s``: the fold cost and the
   all-bucketed serve after it.
 - row-count parity between MOR and monolithic (must be equal).

Usage: python tools/base_delta_probe.py [factor]   (default 100)
Prints one JSON line; exits nonzero on a parity mismatch.
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

from options_data_pipeline_spark.session import get_spark  # noqa: E402
from options_data_pipeline_spark.streaming import bucketed_stream as bd  # noqa: E402
from scale_probe import replicate_orders_lineitem  # noqa: E402


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 1), out


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("base-delta-probe")
    workdir = tempfile.mkdtemp(prefix="bd_probe_")
    try:
        n_rows = replicate_orders_lineitem(spark, src, workdir, factor)
        li = spark.read.parquet(os.path.join(workdir, "lineitem.parquet"))
        rid = F.md5(
            F.concat_ws("|", *[F.col(c).cast("string") for c in li.columns])
        )
        li = li.select(
            rid.alias("row_id"), "l_orderkey", "l_extendedprice", "l_discount"
        )
        od = spark.read.parquet(os.path.join(workdir, "orders.parquet")).select(
            "o_orderkey", "o_orderpriority"
        )
        root = os.path.join(workdir, "bd_store")

        build_s, _ = _timed(
            lambda: bd.build_base(
                li.filter(F.col("l_orderkey") % 10 < 9), root, "l_orderkey",
                buckets=buckets,
            )
        )
        ingest_s, n_delta = _timed(
            lambda: bd.ingest_batch(
                li.filter(F.col("l_orderkey") % 10 == 9), root, "row_id"
            )
        )

        def _rev(df):
            return (
                df.groupBy("o_orderpriority")
                .agg(
                    F.sum(
                        (
                            F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        ).cast("decimal(18,6)")
                    ).alias("revenue"),
                    F.count(F.lit(1)).alias("n"),
                )
            )

        mor_s, mor = _timed(
            lambda: _rev(
                bd.serve_join(spark, root, "l_orderkey", od, "o_orderkey", buckets=buckets)
            ).collect()
        )
        mono_s, mono = _timed(
            lambda: _rev(
                li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            ).collect()
        )
        compact_s, crep = _timed(
            lambda: bd.compact(spark, root, "l_orderkey", buckets=buckets)
        )
        post_s, post = _timed(
            lambda: _rev(
                bd.serve_join(spark, root, "l_orderkey", od, "o_orderkey", buckets=buckets)
            ).collect()
        )

        def _norm(rows):
            return sorted((r.o_orderpriority, str(r.revenue), r.n) for r in rows)

        parity = _norm(mor) == _norm(mono) == _norm(post)
        out = {
            "factor": factor,
            "buckets": buckets,
            "lineitem_rows": n_rows,
            "delta_rows": n_delta,
            "base_build_s": build_s,
            "ingest_s": ingest_s,
            "serve_mor_s": mor_s,
            "serve_monolithic_s": mono_s,
            "compact_s": compact_s,
            "compact_rows": crep["rows"],
            "serve_post_compact_s": post_s,
            "parity": parity,
        }
        print(json.dumps(out))
        return 0 if parity else 1
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
