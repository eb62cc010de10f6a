"""Drift-gate scale probe: per-batch gate cost as the corpus GROWS and
the batch scales ×N (scale_probe replication axes). The claim under
test: the gate is O(batch tokens) + a value-grid KS — batch latency
must stay ~flat as the corpus/quarantine tables grow (the replay guard
reads are doc_id-range-pruned), and scale ~linearly in batch size,
never in store size.

Each slice Caesar-rotates text (distinct content), alternates a
drifted source every 3rd slice (text ×10 length) so both arms of the
router get exercised, and re-feeds slice 0 at the end as a pure replay
(must route 0/0).

Usage: python tools/drift_gate_probe.py [factor] [slices]
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
from options_data_pipeline_spark.streaming import drift_gate as dg  # noqa: E402
from tools.scale_probe import _caesar  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("drift-gate-probe")
    raw = spark.read.parquet(os.path.join(src, "documents.parquet"))
    base = raw.agg((F.max("doc_id") + 1).alias("m")).first().m
    ref = dg.reference_histogram(
        raw.filter(F.col("source") == "src0"), "n_chars"
    ).localCheckpoint(eager=True)

    work = tempfile.mkdtemp(prefix="drift_probe_")
    corpus = os.path.join(work, "corpus")
    quarantine = os.path.join(work, "quarantine")
    lat, appended, quarantined = [], [], []
    try:
        first_slice = None
        for s in range(n_slices):
            reps = range(s * factor // n_slices, (s + 1) * factor // n_slices)
            parts = []
            for r in reps:
                d = raw.select(
                    (F.col("doc_id") + F.lit(r * base)).alias("doc_id"),
                    _caesar(F.col("text"), r).alias("text"),
                    "lang",
                    # every 3rd slice drifts: 10x the text → 10x n_chars
                    F.col("source"),
                    (F.col("n_chars") * (10 if s % 3 == 2 else 1)).alias("n_chars"),
                )
                if s % 3 == 2:
                    d = d.withColumn("text", F.repeat("text", 10))
                parts.append(d)
            import functools

            from pyspark.sql import DataFrame

            batch = functools.reduce(DataFrame.unionByName, parts).localCheckpoint(
                eager=True
            )
            if first_slice is None:
                first_slice = batch
            t0 = time.perf_counter()
            rep = dg.drift_gated_ingest_batch(batch, corpus, quarantine, ref)
            lat.append(round(time.perf_counter() - t0, 2))
            appended.append(rep["appended"])
            quarantined.append(rep["quarantined"])
        t0 = time.perf_counter()
        rep = dg.drift_gated_ingest_batch(first_slice, corpus, quarantine, ref)
        replay_s = round(time.perf_counter() - t0, 2)
        assert rep["appended"] == 0 and rep["quarantined"] == 0, rep
        print(
            json.dumps(
                {
                    "factor": factor,
                    "slices": n_slices,
                    "batch_latency_s": lat,
                    "appended": appended,
                    "quarantined": quarantined,
                    "replay_s": replay_s,
                    "corpus_rows": spark.read.parquet(corpus).count(),
                    "quarantine_rows": spark.read.parquet(quarantine).count(),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
