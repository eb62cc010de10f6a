"""Concurrent serve-while-compaction soak for the base+delta store
(round-12 verdict item 4): a writer thread ingests delta batches and
compacts/rebuckets (pointer swaps) WHILE the reader loop serves, and
every served snapshot must be EXACT w.r.t. SOME committed delta
version — no torn reads (base gen N + tail cutoff from gen N+1 would
drop the rows folded between them), no double-counted tail (cutoff
below the base's fold point would re-serve folded rows).

Correctness argument under test (streaming/bucketed_stream.py
`_resolve_snapshot`): the `_FOLDED_THROUGH` marker is committed INSIDE
the generation before the pointer swap and never modified after, so a
reader that resolves the pointer ONCE and reads that generation's own
marker always gets a committed (base, cutoff) pair; delta segments and
old generations are immutable and never deleted by compaction, so the
lazy scan stays valid across swaps.

The writer records the cumulative row_id set at every committed delta
version; the reader asserts each served id-set equals one of them.
The single-writer contract the store documents is honored (one writer
thread); what this soak adds over crash-injection is the READER
concurrency — serves racing pointer swaps ×cycles.

Usage: python tools/serve_compact_soak.py [cycles] [reader_threads]
Prints one JSON line; exits nonzero on any torn read.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from options_data_pipeline_spark.session import get_spark  # noqa: E402
from options_data_pipeline_spark.streaming import bucketed_stream as bd  # noqa: E402
from options_data_pipeline_spark.streaming.sink import (  # noqa: E402
    manifest_versions,
)

ROW_SCHEMA = "row_id string, k bigint, v double"


def main() -> int:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_readers = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("serve-compact-soak")
    work = tempfile.mkdtemp(prefix="serve_compact_")
    root = os.path.join(work, "store")

    seed = [(f"seed{i}", i % 4, float(i)) for i in range(8)]
    bd.build_base(spark.createDataFrame(seed, ROW_SCHEMA), root, "k", buckets=4)

    lock = threading.Lock()
    # committed_sets[version] = frozenset of row_ids through that version
    committed_sets: dict[int, frozenset] = {-1: frozenset(r[0] for r in seed)}
    latest_version = [-1]
    writer_done = threading.Event()
    stats = {
        "ingests": 0, "compactions": 0, "rebuckets": 0,
        "serves": 0, "torn_reads": 0,
    }
    torn_examples: list[dict] = []

    def writer() -> None:
        cum = set(committed_sets[-1])
        for c in range(1, cycles + 1):
            rows = [(f"c{c}_{i}", (c + i) % 4, float(100 * c + i)) for i in range(3)]
            batch = spark.createDataFrame(rows, ROW_SCHEMA)
            assert bd.ingest_batch(batch, root, "row_id") == 3
            v = max(
                m.get("version", 0)
                for m in manifest_versions(bd._delta_path(root))
            )
            cum.update(r[0] for r in rows)
            with lock:
                committed_sets[v] = frozenset(cum)
                latest_version[0] = v
                stats["ingests"] += 1
            if c % 2 == 0:
                bd.compact(spark, root, "k")
                with lock:
                    stats["compactions"] += 1
            if c % 10 == 0:
                # pointer swap with a LAYOUT change riding along
                bd.rebucket(spark, root, "k", 4 if (c // 10) % 2 else 8)
                with lock:
                    stats["rebuckets"] += 1
        writer_done.set()

    def reader() -> None:
        while not writer_done.is_set() or stats["serves"] < cycles:
            with lock:
                lo = latest_version[0]
            served = {
                r.row_id for r in bd.serve(spark, root, "k").select("row_id").collect()
            }
            with lock:
                hi = latest_version[0]
                candidates = [
                    v for v in committed_sets if lo <= v <= hi
                ] or [lo]
                ok = any(served == committed_sets[v] for v in candidates)
                stats["serves"] += 1
                if not ok:
                    stats["torn_reads"] += 1
                    best = {
                        v: (len(served - committed_sets[v]),
                            len(committed_sets[v] - served))
                        for v in candidates
                    }
                    torn_examples.append(
                        {"lo": lo, "hi": hi, "served_n": len(served),
                         "diffs_vs_candidates": best}
                    )
            if writer_done.is_set() and stats["serves"] >= cycles:
                break

    t0 = time.perf_counter()
    w = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(n_readers)]
    w.start()
    for r in readers:
        r.start()
    w.join()
    for r in readers:
        r.join()
    wall = time.perf_counter() - t0

    # final serve must equal the last committed set exactly
    final = {
        r.row_id for r in bd.serve(spark, root, "k").select("row_id").collect()
    }
    final_ok = final == committed_sets[latest_version[0]]

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "cycles": cycles,
        "readers": n_readers,
        **{k: stats[k] for k in ("ingests", "compactions", "rebuckets", "serves")},
        "torn_reads": stats["torn_reads"],
        "torn_examples": torn_examples[:3],
        "final_exact": final_ok,
        "seconds": round(wall, 1),
    }
    print(json.dumps(out))
    return 0 if stats["torn_reads"] == 0 and final_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
