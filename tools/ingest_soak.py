"""Ingest soak: drive the streaming incremental-dedup loop
(streaming/doc_ingest.py) at ×N document scale and measure what a
deployment cares about — per-batch latency as the INDEX GROWS, and the
dedup hit rate.

Corpus construction reuses the scale-probe replication axes
(tools/scale_probe.py): each replica Caesar-rotates text so replicas are
NOT near-dups of each other (organic dup rate), then a configurable
fraction of slices is re-emitted as near-dup batches (case-flipped
copies of earlier docs with fresh ids) — the workload an incremental
dedup exists for.

The number that matters: batch latency must stay ~flat as the corpus
and signature table grow — the probe is O(batch) + a bounded index join,
never O(corpus tokens). A latency line that climbs with batch number
means corpus work leaked into the per-batch path.

Usage: python tools/ingest_soak.py [factor] [slices]
Prints one JSON line.
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
from options_data_pipeline_spark.streaming.doc_ingest import (  # noqa: E402
    dedup_ingest_batch,
)
from tools.scale_probe import _caesar  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("ingest-soak")
    raw = spark.read.parquet(os.path.join(src, "documents.parquet"))
    base = raw.agg((F.max("doc_id") + 1).alias("m")).first().m
    n_docs = raw.count()

    work = tempfile.mkdtemp(prefix="ingest_soak_")
    corpus = os.path.join(work, "corpus")
    sigs = os.path.join(work, "signatures")
    lat: list[float] = []
    appended: list[int] = []
    total_fed = 0
    try:
        for s in range(n_slices):
            reps = range(s * factor // n_slices, (s + 1) * factor // n_slices)
            parts = []
            for r in reps:
                parts.append(
                    raw.select(
                        (F.col("doc_id") + F.lit(r * base)).alias("doc_id"),
                        _caesar(F.col("text"), r).alias("text"),
                    )
                )
            if s % 3 == 2:
                # every third slice: a near-dup wave — case-flipped copies
                # of slice-0 docs under fresh ids (the dedup target)
                parts.append(
                    raw.select(
                        (F.col("doc_id") + F.lit((factor + s) * base)).alias("doc_id"),
                        F.upper(F.col("text")).alias("text"),
                    )
                )
            batch = parts[0]
            for p in parts[1:]:
                batch = batch.unionByName(p)
            total_fed += n_docs * len(parts)
            t0 = time.perf_counter()
            n = dedup_ingest_batch(batch, corpus, sigs)
            lat.append(round(time.perf_counter() - t0, 3))
            appended.append(n)

        kept = spark.read.parquet(corpus).count()
        sig_rows = spark.read.parquet(sigs).count()
        half = len(lat) // 2
        print(
            json.dumps(
                {
                    "factor": factor,
                    "slices": n_slices,
                    "docs_fed": total_fed,
                    "docs_kept": kept,
                    "sig_rows": sig_rows,
                    "batch_latency_s": lat,
                    "appended": appended,
                    "first_half_mean_s": round(sum(lat[:half]) / max(half, 1), 3),
                    "second_half_mean_s": round(
                        sum(lat[half:]) / max(len(lat) - half, 1), 3
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
