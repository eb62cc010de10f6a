"""Scale probe: replicate sf0.1 tables ×N with per-replica decorrelating
transforms, then time registry queries on the inflated data to validate
the scaling claims in BASELINE.md before trusting them at 100 TB.

Replication axes are chosen to mimic MORE data, not MORE duplicates:
 - events: each replica gets a suffixed symbol universe (``SYM_r<k>``) and
   offset event_ids — the realistic growth axis is more instruments, and
   per-symbol window sizes stay constant.
 - documents: each replica Caesar-rotates letters by ``r % 26`` and digits
   by ``r % 10`` (unique combo for r < 130), so replicas share length /
   token-shape distribution but almost no shingles — near-dup cluster
   sizes stay at their organic level instead of inflating ×N (which would
   measure a different workload: a corpus that is 99% exact dups).
 - embeddings: each replica rotates the vector by ``r % dim`` positions and
   sign-flips for odd replicas (norm- and pair-angle-preserving, but
   rotated random vectors are ~orthogonal to other replicas), and offsets
   the IVF ``label`` by ``r * 10`` so cell population stays constant —
   the "more data ⇒ proportionally more cells" axis.

Usage: python tools/scale_probe.py [factor] [query ...]
Defaults: factor=100, queries = minhash_lsh embedding_near_dup gap_fill.
Prints one JSON line {"factor": N, "rows": {...}, "queries": {name: sec}}.
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from options_data_pipeline_spark import registry  # noqa: E402
from options_data_pipeline_spark.session import get_spark  # noqa: E402
from options_data_pipeline_spark.sources.tables import load_table  # noqa: E402

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def _rot(s: str, n: int) -> str:
    return s[n:] + s[:n]


def _caesar(col, r: int):
    src = LOWER + UPPER + DIGIT
    dst = _rot(LOWER, r % 26) + _rot(UPPER, r % 26) + _rot(DIGIT, r % 10)
    return F.translate(col, src, dst)


def replicate_events(spark: SparkSession, src: str, out: str, factor: int) -> int:
    # load_table handles the ns-vs-µs parquet timestamp probe; replicas are
    # written back as native timestamp[µs] parquet
    raw = load_table(spark, "events", src)
    base = raw.agg((F.max("event_id") + 1).alias("m")).first().m
    parts = []
    for r in range(factor):
        parts.append(
            raw.select(
                (F.col("event_id") + F.lit(r * base)).alias("event_id"),
                "ts",
                "user_id",
                F.concat(F.col("event_type"), F.lit(f"_r{r}")).alias("event_type"),
                "value",
                "props",
            )
        )
    df = functools.reduce(DataFrame.unionByName, parts)
    df.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return raw.count() * factor


def replicate_documents(spark: SparkSession, src: str, out: str, factor: int) -> int:
    raw = spark.read.parquet(os.path.join(src, "documents.parquet"))
    base = raw.agg((F.max("doc_id") + 1).alias("m")).first().m
    parts = []
    for r in range(factor):
        parts.append(
            raw.select(
                (F.col("doc_id") + F.lit(r * base)).alias("doc_id"),
                _caesar(F.col("text"), r).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = functools.reduce(DataFrame.unionByName, parts)
    df.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return raw.count() * factor


def replicate_part(spark: SparkSession, src: str, out: str, factor: int) -> int:
    """Catalog-axis growth for part-table ops (entity resolution):
    each replica offsets p_partkey and Caesar-rotates the p_name
    letters (r % 26 rotations), so replicas contribute NEW name-token
    vocabulary — within-replica match structure is preserved, across
    replicas nothing spuriously matches (the documents-axis
    decorrelation rule; same ≤ 26-replica uniqueness bound)."""
    raw = spark.read.parquet(os.path.join(src, "part.parquet"))
    base = raw.agg((F.max("p_partkey") + 1).alias("m")).first().m
    other = [c for c in raw.columns if c not in ("p_partkey", "p_name")]
    parts = []
    for r in range(factor):
        parts.append(
            raw.select(
                (F.col("p_partkey") + F.lit(r * base)).alias("p_partkey"),
                _caesar(F.col("p_name"), r).alias("p_name"),
                *other,
            )
        )
    df = functools.reduce(DataFrame.unionByName, parts)
    df.write.mode("overwrite").parquet(os.path.join(out, "part.parquet"))
    return raw.count() * factor


def replicate_embeddings(spark: SparkSession, src: str, out: str, factor: int) -> int:
    raw = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    base = raw.agg((F.max("vec_id") + 1).alias("m")).first().m
    dim = len(raw.select("embedding").first().embedding)
    n_labels = raw.agg(F.countDistinct("label").alias("n")).first().n
    parts = []
    for r in range(factor):
        shift = r % dim
        rotated = F.concat(
            F.slice("embedding", shift + 1, dim - shift), F.slice("embedding", 1, shift)
        )
        if r % 2 == 1:
            rotated = F.transform(rotated, lambda x: -x)
        parts.append(
            raw.select(
                (F.col("vec_id") + F.lit(r * base)).alias("vec_id"),
                rotated.alias("embedding"),
                (F.col("label") + F.lit(r * n_labels)).alias("label"),
            )
        )
    df = functools.reduce(DataFrame.unionByName, parts)
    df.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return raw.count() * factor


def replicate_orders_lineitem(
    spark: SparkSession, src: str, out: str, factor: int
) -> int:
    """TPC-H fact growth axis: ×N orders (and their lineitems) over the
    SAME customer/supplier/part dims — keys offset per replica so the
    order→lineitem join cardinality is preserved while dim fan-in grows,
    which is how a real order fact scales."""
    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    base = orders.agg((F.max("o_orderkey") + 1).alias("m")).first().m
    o_parts, l_parts = [], []
    for r in range(factor):
        off = F.lit(r * base)
        o_parts.append(orders.select(
            (F.col("o_orderkey") + off).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        ))
        l_parts.append(lineitem.select(
            (F.col("l_orderkey") + off).alias("l_orderkey"),
            *[c for c in lineitem.columns if c != "l_orderkey"],
        ))
    functools.reduce(DataFrame.unionByName, o_parts).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    functools.reduce(DataFrame.unionByName, l_parts).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    return lineitem.count() * factor


def replicate_copurchase(
    spark: SparkSession, src: str, out: str, factor: int
) -> int:
    """Catalog-growth axis for graph workloads over the order fact: ×N
    orders AND ×N part universes (BOTH keys offset per replica). Each
    replica's baskets co-purchase inside its own catalog slice, so
    edges, wedges and triangles all grow ×N — how a retailer's
    co-purchase graph actually scales (new products cluster with new
    products). Contrast with lineitem+orders, which repeats the SAME
    catalog: distinct edges would not grow at all there."""
    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    base_o = orders.agg((F.max("o_orderkey") + 1).alias("m")).first().m
    base_p = lineitem.agg((F.max("l_partkey") + 1).alias("m")).first().m
    o_parts, l_parts = [], []
    for r in range(factor):
        o_parts.append(orders.select(
            (F.col("o_orderkey") + F.lit(r * base_o)).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        ))
        l_parts.append(lineitem.select(
            (F.col("l_orderkey") + F.lit(r * base_o)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(r * base_p)).alias("l_partkey"),
            *[c for c in lineitem.columns if c not in ("l_orderkey", "l_partkey")],
        ))
    functools.reduce(DataFrame.unionByName, o_parts).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    functools.reduce(DataFrame.unionByName, l_parts).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    return lineitem.count() * factor


NEEDS = {
    "events": replicate_events,
    "documents": replicate_documents,
    "embeddings": replicate_embeddings,
    "lineitem+orders": replicate_orders_lineitem,
    "copurchase": replicate_copurchase,
    "part": replicate_part,
}


def _probe_rp_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from options_data_pipeline_spark.functions.similarity import rp_lsh_near_dup_pairs
    from options_data_pipeline_spark.sources.tables import load_table

    return rp_lsh_near_dup_pairs(load_table(spark, "embeddings", sf_dir), threshold=0.35)


def _probe_simhash_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from options_data_pipeline_spark.functions.dedupe import simhash_near_pairs
    from options_data_pipeline_spark.sources.tables import load_table

    return simhash_near_pairs(load_table(spark, "documents", sf_dir))


# Probe-only entries: the registry queries pin small oracle params so their
# hashes never move; these run the same operators at DEFAULT (auto-sized)
# args — the config a user gets — so the scaling claim is measured on the
# defaults, not the pinned toy config.
def _probe_knn_label_noise_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from options_data_pipeline_spark.functions.similarity import (
        knn_label_noise_frame,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    return knn_label_noise_frame(load_table(spark, "embeddings", sf_dir))


EXTRA_PROBES = {
    "rp_lsh_auto": _probe_rp_lsh_auto,
    "simhash_auto": _probe_simhash_auto,
    "knn_label_noise_auto": _probe_knn_label_noise_auto,
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or ["minhash_lsh", "embedding_near_dup", "gap_fill"]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Honesty guard: the documents axis decorrelates via Caesar rotation
    # (26 letter × 10 digit rotations → 130 unique combos). At factor ≥
    # 130 replicas REPEAT transforms, so each document gains exact
    # duplicates and near-dup probes measure a saturated-duplicate corpus
    # instead of "more data" — the ×300 minhash artifact that cost a
    # misleading 622 s BASELINE row in round 4. Refuse unless explicitly
    # overridden.
    if factor >= 130:
        doc_probes = {"minhash", "simhash", "dedup", "ngram", "dup_ngram",
                      "span", "decontam", "winnow", "doc", "corpus"}
        risky = [n for n in names if any(k in n for k in doc_probes)]
        if risky and not os.environ.get("SPARK_GRAFT_PROBE_FORCE"):
            print(
                json.dumps({
                    "error": "factor >= 130 exceeds the documents axis's "
                    "Caesar decorrelation range (130 unique rotations); "
                    "replicas would be exact duplicates and these probes "
                    "would measure duplicate saturation, not scale",
                    "risky_queries": risky,
                    "override": "set SPARK_GRAFT_PROBE_FORCE=1",
                }),
                file=sys.stderr,
            )
            sys.exit(2)

    spark = get_spark("scale-probe")
    out = tempfile.mkdtemp(prefix=f"scale_probe_x{factor}_")
    try:
        rows: dict[str, int] = {}
        # SPARK_GRAFT_PROBE_TABLES (comma-separated NEEDS keys) restricts
        # replication to the tables the probed queries actually read —
        # the rest pass through at ×1. Replicating every axis for every
        # probe wastes minutes and, worse, stacks unrelated ×100 tables'
        # write-side memory into the probe JVM.
        only = os.environ.get("SPARK_GRAFT_PROBE_TABLES")
        wanted = {t.strip() for t in only.split(",")} if only else None
        for table, fn in NEEDS.items():
            if wanted is not None and table not in wanted:
                continue
            rows[table] = fn(spark, src, out, factor)
        # non-replicated tables pass through so any query can run
        for f in os.listdir(src):
            dst = os.path.join(out, f)
            if f.endswith(".parquet") and not os.path.exists(dst):
                s = os.path.join(src, f)
                (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, dst)

        qs = {**registry.queries(), **EXTRA_PROBES}
        timings: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, out).write.format("noop").mode("overwrite").save()
            # a repeated name records as name@warm — used to split a
            # build-once query (e.g. pq_adc_topk_indexed) into its cold
            # (index build + search) and warm (search-only) costs
            key = name if name not in timings else f"{name}@warm"
            timings[key] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"factor": factor, "rows": rows, "queries": timings}))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
