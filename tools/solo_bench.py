"""Solo re-measurement harness (the r6 drift-attribution convention).

Runs ONE registry query in a fresh SparkSession at $SPARK_GRAFT_SF_DIR
(default sf0.1), N times (default 3, after one untimed warmup), and
prints a JSON line {"query": ..., "runs": [...], "min": ..., "median":
...}. Solo numbers are the ground truth the in-suite bench numbers are
judged against: a query whose in-suite time >> solo time is suffering
suite-position cache pressure, not a regression (the round-10
dedup_canonical_incremental lesson).

Usage: python tools/solo_bench.py <query_name> [n_runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from options_data_pipeline_spark import registry  # noqa: E402
from options_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"solo-{name}")
    fn = registry.queries()[name]
    # untimed warmup: JIT + parquet footers + any write-once index build
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs": runs,
                "min": min(runs),
                "median": round(statistics.median(runs), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
