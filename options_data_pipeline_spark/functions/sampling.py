"""Deterministic sampling / splitting / mixing for training-data assembly
(SURVEY.md §2.10 extension surface).

Everything here is HASH-BUCKET based, never ``rand()``: a document's
split or keep-decision is a pure function of its id, so runs are
reproducible across engines, retries, and cluster sizes — the property a
training-data pipeline actually needs from its sampler (the same doc must
never hop from test into train on a re-run). md5-derived buckets mirror
bit-for-bit in the DuckDB oracles.

At 100 TB these are narrow maps (no shuffle until the consumer
aggregates) and the bucket filter pushes into the scan's row-group
pruning where the id is a sort/cluster key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket_col(
    id_col: str = "doc_id", buckets: int = N_BUCKETS, salt: str = ""
) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of the
    salted id string — identical in DuckDB:
    ``CAST(concat('0x', substr(md5(concat(salt, CAST(id AS VARCHAR))),1,8)) AS BIGINT) % buckets``.

    ``salt`` makes independent decisions independent: every decision that
    samples the same population MUST use its own salt, otherwise the
    decisions are fully correlated (e.g. an unsalted mixture keep at rate
    ≤ train-fraction selects a strict subset of the train buckets and
    val/test get ZERO documents from that source)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % buckets


def split_col(
    id_col: str = "doc_id",
    train_per_myriad: int = 9800,
    val_per_myriad: int = 9900,
) -> Column:
    """train/val/test assignment (default 98% / 1% / 1%) from the hash
    bucket — stable under corpus growth: adding documents never reassigns
    existing ones. Salted ``'split:'`` so the decision is independent of
    mixture keep-decisions over the same ids."""
    b = hash_bucket_col(id_col, salt="split:")
    return (
        F.when(b < train_per_myriad, F.lit("train"))
        .when(b < val_per_myriad, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def mixture_keep_col(
    source_col: str = "source",
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    id_col: str = "doc_id",
) -> Column:
    """Weighted source mixing: keep a deterministic ``rates[source]``
    fraction of each source's documents (undersampling the over-represented
    source is the standard corpus-mixing move). The per-source threshold
    is a small CASE over the (tiny) source vocabulary; the keep decision
    stays a narrow map. Salted ``'mix:'`` so keep-decisions are
    independent of split assignment — apply-mixture-then-split keeps the
    98/1/1 split ratios within every source."""
    b = hash_bucket_col(id_col, salt="mix:")
    threshold = F.lit(int(default_rate * N_BUCKETS))
    for src, rate in sorted((rates or {}).items()):
        threshold = F.when(F.col(source_col) == src, F.lit(int(rate * N_BUCKETS))).otherwise(
            threshold
        )
    return b < threshold


def pack_sequences(
    docs: DataFrame,
    budget: int = 128,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequential SEQUENCE PACKING: walk each source's documents in
    doc_id order and close the current bin whenever the next document
    would overflow ``budget`` tokens — the batch-assembly step that turns
    a filtered corpus into fixed-token-budget training rows (wasted pad
    tokens ∝ bin underfill). A document longer than the budget gets a bin
    of its own (never split here; chunk first if that matters).

    The walk is inherently sequential, so it runs as a pandas island
    per source group (``applyInPandas``) — same justification as the ATR
    recursion: per-group state, parallel ACROSS groups/shards, and at
    100 TB you pack within shards anyway (global packing order is not a
    training requirement; determinism is). Token counts are computed
    Spark-side first; pandas only runs the integer walk. Oracle: linear
    recursive CTE per source, like the ATR recursion."""
    import pandas as pd

    counted = docs.select(
        F.col(source_col).alias("source"),
        "doc_id",
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '\\\\S+', 0)")
        ).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        for i, tok in enumerate(pdf["n_tokens"]):
            tok = int(tok)
            if i == 0:
                fill = tok
            elif fill + tok > budget:
                bin_id += 1
                fill = tok
            else:
                fill += tok
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return counted.groupBy("source").applyInPandas(
        pack,
        schema="source string, doc_id long, n_tokens long, bin_id long, bin_fill long",
    )


def stratified_sample(
    docs: DataFrame,
    per_stratum: int = 100,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: keep the first ``per_stratum``
    documents of each stratum under a salted-hash order — balanced
    subsampling for eval-set construction or per-source corpus caps.
    Hash order (not id order) makes the sample unbiased w.r.t. id
    assignment while staying a pure function of the ids: re-runs,
    engines, and cluster sizes all pick the same rows.

    One shuffle at the stratum grain; the rank is a window with a
    per-stratum heap (WindowGroupLimit pushes the ``<= N`` bound down,
    same plan as top_parts_per_brand)."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit("strat:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col), F.col(stratum_col), h.alias("h"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= per_stratum)
        .select(
            id_col, stratum_col, F.col("sample_rank").cast("long").alias("sample_rank")
        )
    )


def per_group_top_fraction(
    df: DataFrame,
    score: Column,
    keep_fraction: float = 0.75,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_fraction`` of each group by score — the
    per-domain quality gate (a global threshold over-prunes clean domains
    and under-prunes noisy ones; filtering against the DOMAIN's own
    distribution is the standard fix). Rank-based, so the cut is
    integer-exact in every engine: a float percentile threshold would
    hang the keep decision on an interpolated value's last bits.

    One shuffle at the group grain; rank and group size come from the
    same window pass. Ties break toward the smaller id (deterministic)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(score.desc(), F.col(id_col).asc())
    wc = Window.partitionBy(group_col)
    ranked = (
        df.withColumn("q_rank", F.row_number().over(w))
        .withColumn("grp_n", F.count(F.lit(1)).over(wc))
    )
    # ceil(f * n) in pure integer arithmetic: f as a ratio of 10000ths
    frac = int(round(keep_fraction * 10000))
    keep_n = F.floor((F.col("grp_n") * frac + 9999) / 10000)
    return (
        ranked.filter(F.col("q_rank") <= keep_n)
        .withColumn("q_rank", F.col("q_rank").cast("long"))
        .drop("grp_n")
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
) -> DataFrame:
    """α-tempered source re-weighting (multilingual-LM sampling, Conneau &
    Lample 2019): sampling share t_i = p_i^α / Σ p_j^α flattens the raw
    source distribution toward uniform as α→0, leaving it unchanged at
    α=1 — the knob that keeps low-resource sources from drowning.

    Per-source counts aggregate first (one shuffle to ~|sources| rows);
    the Σ p^α normalizer is a 1-row broadcast cross join, never a second
    scan. Shares are rounded to the 9-dp grid: the normalizer is a
    multi-row double sum whose addition order is engine-internal (same
    rule as the k-means centroid grid). ``sample_cap`` = floor(t_i × N),
    the integer per-source budget a sampler would enforce."""
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("z"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_total"), 9).alias("raw_share"),
            F.round(
                F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("z"), 9
            ).alias("tempered_share"),
            F.floor(
                F.round(
                    F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                    / F.col("z"), 9
                )
                * F.col("n_total")
            ).cast("long").alias("sample_cap"),
        )
    )


def budget_sample(
    docs: DataFrame,
    token_budget: int = 10_000,
    score: Column | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Fill a per-source TOKEN budget greedily by score: documents are
    taken best-first until the source's running token total passes the
    budget (the first over-budget doc is included — budgets are floors
    for training-mix construction, not caps; deterministic either way).
    This is the assembly step after quality scoring and mixture
    weighting: "give me the best N tokens per source".

    One shuffle at the source grain; the running total is a cumulative
    window SUM over the same partition the rank uses. Integer token
    arithmetic — no float gate. Ties break toward the smaller id."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(*( [score.desc()] if score is not None else [] ), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(tokens_col)).over(w)
    return (
        docs.withColumn("cum_tokens", running.cast("long"))
        .filter(
            (F.col("cum_tokens") - F.col(tokens_col) < token_budget)
        )
    )


def unimax_allocation(
    lang_counts: DataFrame, frac: float = 0.6, cap: float = 2.0
) -> DataFrame:
    """UniMax language-sampling allocation (Chung et al. 2023): split a
    token budget (``frac`` × corpus) across groups by waterfilling with a
    per-group EPOCH CAP — groups small enough to hit cap×size are capped,
    the remainder splits equally among the rest. Input: (lang, n) with n
    as DOUBLE token counts. The sequential waterfill has a closed form:
    sort ascending, k* = max{k : cap·n_k·(L−k) ≤ B − cumcap_k} (largest
    capped prefix), everyone past k* gets the equal share — ONE window
    pass over L group rows; no iteration, no collect. Parity with the
    sequential greedy is pinned in tests/test_round11_ops.py."""
    from pyspark.sql import Window

    w = Window.orderBy("n", "lang")
    ordered = lang_counts.select(
        "lang",
        "n",
        F.row_number().over(w).alias("rn"),
        F.sum(F.lit(cap) * F.col("n")).over(w).alias("cumcap"),
    )
    tot = lang_counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    marked = ordered.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "rn",
        "cumcap",
        "n_langs",
        (F.lit(frac) * F.col("total")).alias("budget"),
        F.when(
            F.lit(cap) * F.col("n") * (F.col("n_langs") - F.col("rn"))
            <= F.lit(frac) * F.col("total") - F.col("cumcap"),
            F.col("rn"),
        )
        .otherwise(F.lit(0))
        .alias("k_cand"),
    )
    kstar = marked.agg(F.max("k_cand").alias("k"))
    params = marked.select("n_langs", "budget").distinct()
    level = (
        kstar.crossJoin(F.broadcast(params))
        .join(
            F.broadcast(marked.select(F.col("rn").alias("k"), "cumcap")),
            "k",
            "left",
        )
        .select(
            F.when(F.col("k") >= F.col("n_langs"), F.lit(0.0))
            .when(F.col("k") == 0, F.col("budget") / F.col("n_langs"))
            .otherwise(
                (F.col("budget") - F.col("cumcap"))
                / (F.col("n_langs") - F.col("k"))
            )
            .alias("share"),
            "k",
        )
    )
    alloc = F.when(
        F.col("rn") <= F.col("k"), F.lit(cap) * F.col("n")
    ).otherwise(F.col("share"))
    return marked.crossJoin(F.broadcast(level)).select(
        "lang",
        F.col("n").cast("long").alias("n_tokens"),
        F.round(alloc, 3).alias("alloc_tokens"),
        F.round(alloc / F.col("n"), 6).alias("epochs"),
        (F.col("rn") <= F.col("k")).alias("capped"),
    )
