"""Deterministic Bloom-filter prefilter — the BFF/Dolma-style cheap
membership gate in front of an exact dedup join.

At 100 TB the exact id/fingerprint anti-join is correct but touches the
corpus index for EVERY incoming row; a Bloom filter built over the
corpus keys lets the ingest path drop the definitely-new majority
without the join (no false negatives by construction — a miss is proof
of absence), sending only the might-contain minority to the exact
check. The filter itself is tiny (bits ∝ corpus keys) and broadcasts.

Spark-first and engine-portable: hash positions derive from md5
substrings (``conv(substr(md5(key:i),1,15),16,10)``) — the same
cross-engine trick the shingle hashes use — so a DuckDB oracle can
rebuild the identical filter and verify both the bit array and every
membership verdict hash-exactly. The filter aggregates as N 64-bit
words via per-word ``bit_or``; 62 usable bits per word keeps every
shift/test inside non-negative BIGINT range in both engines.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k with m = 62·n_words
bits, k hashes. The defaults (n_words=16, k=4 → m=992) are test-scale;
a deployment sizes n_words ∝ corpus keys (the build is the same single
aggregation at any size; at billions of keys use partitioned blooms —
one filter per key-range bucket — so each stays broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 62  # stay clear of BIGINT sign bit in BOTH engines


def _positions(key: F.Column, k: int, m_bits: int) -> list[F.Column]:
    """k deterministic bit positions in [0, m_bits) for a key."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f":{i}"))), 1, 15), 16, 10
        ).cast("long")
        % m_bits
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str = "fingerprint",
    n_words: int = 16,
    k: int = 4,
) -> DataFrame:
    """ONE-row Bloom filter over ``keys[key_col]``: columns w0..w{n-1}
    (bit words), plus n_words/k so probes self-describe. The build is a
    single map + one all-to-one aggregation (each mapper emits k set
    bits; partial bit_or combines map-side)."""
    m_bits = n_words * BITS_PER_WORD
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), k, m_bits))).alias("p")
    )
    bit = pos.select(
        (F.col("p") / BITS_PER_WORD).cast("int").alias("w"),
        # call_function: the SQL shiftleft takes a COLUMN bit count (the
        # Python wrapper's numBits is int-only)
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.col("p") % BITS_PER_WORD).cast("int"),
        ).alias("b"),
    )
    aggs = [
        F.coalesce(F.bit_or(F.when(F.col("w") == w, F.col("b"))), F.lit(0).cast("long")).alias(f"w{w}")
        for w in range(n_words)
    ]
    return bit.agg(
        *aggs, F.lit(n_words).alias("n_words"), F.lit(k).alias("k")
    )


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "fingerprint",
    n_words: int = 16,
    k: int = 4,
    out_col: str = "might_contain",
) -> DataFrame:
    """Attach the membership verdict: True = key MIGHT be in the built
    set (send to the exact check), False = key is DEFINITELY absent
    (skip the join entirely — zero false negatives). The 1-row filter
    broadcasts; the probe is pure Column arithmetic, no shuffle.

    NULL keys: md5(NULL) would propagate NULL through every bit test and
    a downstream ``filter(~might_contain)`` would silently drop the row
    (three-valued logic); instead a NULL key yields ``True`` so it always
    reaches the exact check — the 'no false negatives' contract holds for
    every row, including null-key rows."""
    m_bits = n_words * BITS_PER_WORD
    probed = df.crossJoin(F.broadcast(bloom))
    # verdict built as ONE SQL expression string (r13): the k x n_words
    # CASE-chain Column tree cost ~0.5 s of py4j construction per run;
    # the text spells out the identical expressions (same double-divide
    # word index, same CASE order, same AND chain), so results are
    # bit-identical.
    hits = []
    for i in range(k):
        p = (
            f"CAST(conv(substring(md5(concat({key_col}, ':{i}')), 1, 15),"
            f" 16, 10) AS BIGINT) % {m_bits}"
        )
        w = f"CAST({p} / {BITS_PER_WORD} AS INT)"
        b = f"CAST({p} % {BITS_PER_WORD} AS INT)"
        case = (
            "CASE "
            + " ".join(f"WHEN {w} = {i2} THEN w{i2}" for i2 in range(n_words))
            + " END"
        )
        hits.append(f"(shiftright({case}, {b}) % 2) = 1")
    verdict = F.expr(
        f"CASE WHEN {key_col} IS NULL THEN true"
        f" ELSE ({' AND '.join(hits)}) END"
    )
    return probed.select(*df.columns, verdict.alias(out_col))


def bloom_build_partitioned(
    keys: DataFrame,
    key_col: str = "fingerprint",
    n_partitions: int = 16,
    n_words: int = 16,
    k: int = 4,
) -> DataFrame:
    """The billions-of-keys rung the single-filter docstring promises:
    ONE Bloom row per key-hash bucket (``n_partitions`` rows total), so
    total filter capacity scales as n_partitions × n_words words while
    every row stays a fixed-width record — the whole filter table is
    still broadcast-sized up to thousands of buckets, and each probe key
    touches exactly ONE row. Bucket choice is a deterministic md5 of the
    key (hash partitioning, not ranges: uniform fill regardless of key
    distribution)."""
    m_bits = n_words * BITS_PER_WORD
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col(key_col), F.lit("#b"))), 1, 8), 16, 10)
        .cast("long") % n_partitions
    ).cast("int")
    pos = keys.select(
        bucket.alias("bloom_bucket"),
        F.explode(F.array(*_positions(F.col(key_col), k, m_bits))).alias("p"),
    )
    bit = pos.select(
        "bloom_bucket",
        (F.col("p") / BITS_PER_WORD).cast("int").alias("w"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.col("p") % BITS_PER_WORD).cast("int"),
        ).alias("b"),
    )
    aggs = [
        F.coalesce(
            F.bit_or(F.when(F.col("w") == w, F.col("b"))), F.lit(0).cast("long")
        ).alias(f"w{w}")
        for w in range(n_words)
    ]
    return bit.groupBy("bloom_bucket").agg(*aggs)


def bloom_might_contain_partitioned(
    df: DataFrame,
    blooms: DataFrame,
    key_col: str = "fingerprint",
    n_partitions: int = 16,
    n_words: int = 16,
    k: int = 4,
    out_col: str = "might_contain",
) -> DataFrame:
    """Partitioned-probe twin: compute each key's bucket, broadcast-join
    the (tiny) bloom table on it, test the same k bits. A key whose
    bucket has no bloom row (nothing was ever inserted there) is
    definitely absent. NULL keys yield ``True`` (routed to the exact
    check), same contract as :func:`bloom_might_contain`."""
    m_bits = n_words * BITS_PER_WORD
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col(key_col), F.lit("#b"))), 1, 8), 16, 10)
        .cast("long") % n_partitions
    ).cast("int")
    probed = df.withColumn("bloom_bucket", bucket).join(
        F.broadcast(blooms), "bloom_bucket", "left"
    )
    cond = None
    for p in _positions(F.col(key_col), k, m_bits):
        w = (p / BITS_PER_WORD).cast("int")
        b = (p % BITS_PER_WORD).cast("int")
        expr = None
        for i in range(n_words):
            expr = (
                F.when(w == i, F.col(f"w{i}"))
                if expr is None
                else expr.when(w == i, F.col(f"w{i}"))
            )
        hit = (F.call_function("shiftright", F.coalesce(expr, F.lit(0)), b) % 2) == 1
        cond = hit if cond is None else (cond & hit)
    verdict = F.when(F.col(key_col).isNull(), F.lit(True)).otherwise(cond)
    return probed.select(*df.columns, verdict.alias(out_col))
