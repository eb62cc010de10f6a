"""Suite-position inflation probe (r13).

Replays the bench loop (min-of-2, noop sink, _clear_state between
queries) over HEADLINE[:N], then times the TARGET query exactly as the
bench would at that position, reporting JVM GC time and heap deltas
accumulated across the prefix. Diagnoses why a query's in-suite time can
be a multiple of its solo time on the same host (bm25_rank r13 baseline:
5.39 s in-suite vs 1.66 s solo) — cache pressure vs GC vs JIT.

Usage: python tools/suite_probe.py <target_query> <prefix_n> [skip_every]
       skip_every=k keeps every k-th prefix query (faster approximations
       of deep positions).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _clear_state  # noqa: E402
from options_data_pipeline_spark import registry  # noqa: E402
from options_data_pipeline_spark.session import get_spark  # noqa: E402


def _gc_ms(spark) -> tuple[int, int]:
    """(total GC ms, used heap MB) from the driver JVM."""
    jvm = spark._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    total = 0
    it = beans.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    used = mem.getHeapMemoryUsage().getUsed() // (1024 * 1024)
    return int(total), int(used)


def main() -> None:
    target = sys.argv[1]
    prefix_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    skip = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("suite-probe")
    qs = registry.queries()
    qs["buffer_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    gc0, heap0 = _gc_ms(spark)
    t_pre = time.perf_counter()
    prefix = [n for n in HEADLINE[:prefix_n] if n != target][::skip]
    for name in prefix:
        for _ in range(2):
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        _clear_state(spark)
    gc1, heap1 = _gc_ms(spark)
    pre_wall = time.perf_counter() - t_pre
    best = None
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        qs[target](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        runs.append(round(dt, 3))
        best = dt if best is None or dt < best else best
    gc2, heap2 = _gc_ms(spark)
    print(
        json.dumps(
            {
                "target": target,
                "prefix_n": len(prefix),
                "prefix_wall_s": round(pre_wall, 1),
                "target_runs": runs,
                "target_min": round(best, 3),
                "gc_ms_prefix": gc1 - gc0,
                "gc_ms_target": gc2 - gc1,
                "heap_mb_after_prefix": heap1,
                "heap_mb_after_target": heap2,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
