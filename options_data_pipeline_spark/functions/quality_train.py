"""TRAINED quality classifier — fixed-iteration batch gradient descent
fit IN-ENGINE, then scored with the same rational squash the literal-
weight `quality_linear_score` uses. Completes the curation stack's
heuristic (gopher_quality) → linear (literal weights) → LEARNED rung —
the fastText-style trained filter every production corpus pipeline runs
(reference analogue: none — extension track, SURVEY §2.10).

Float-determinism contract (the pq_learned_quantize discipline applied
to gradient descent):

* The squash is ``p = 0.5 + 0.5 · z/(1+|z|)`` — algebraic (one
  division, one abs, no exp), so every per-doc value is a fixed-
  parenthesization chain of exactly-rounded IEEE ops, bit-identical
  across engines. The update is the LOGISTIC-REGRESSION rule
  ``g = (p − y)·x`` (for the true sigmoid this is exactly the
  cross-entropy gradient; with the rational squash it is the same
  mean-shift update with the squash standing in for the sigmoid —
  chosen over the squared-error gradient whose 1/(1+|z|)² factor
  vanishes and stalls training).
* Per-doc gradient contributions are rounded half-away to the 12-dp
  grid and summed as DECIMAL(38,12) — order-free, so the 1000-executor
  sum equals the single-threaded oracle sum exactly.
* Weight updates ``w ← w − LR·(S/n)`` run in IEEE double with LR a
  power of two (8.0 — the multiply is exact); Python driver floats ARE
  IEEE doubles, so the driver-side update mirrors the oracle's CTE
  arithmetic bit-for-bit.
* Features are CENTERED by dyadic constants (x−0.25, x−0.0625, x−0.5 —
  exact subtractions) so the bias and the feature gradients decouple
  and fixed-step GD converges in tens, not thousands, of steps.
* Deterministic zero init, fixed iteration count — the whole trajectory
  is a pure function of the corpus, and the DuckDB oracle replays it as
  an unrolled CTE chain (one gradient CTE + one update CTE per step).

Scale shape: training is ``ITERS`` linear scans of a 5-column double
table (one grain-collapsing aggregate each, map-side combined, NO
shuffle beyond the 1-row agg), with the feature table localCheckpointed
once so the text parse is paid once, not per iteration. Inference is
one narrow whole-stage-codegen'd map — identical to
quality_linear_score's shape with learned instead of literal weights.

Label (planted, integer-exact, mirrored verbatim in the oracle): a doc
is "quality" when more than half its tokens are distinct
(``2·n_distinct > n_tokens`` — the lexical-diversity rule the heuristic
tier approximates). GD must rediscover the x3 > 0.5 boundary from the
correlated feature triple; measured at sf0.01: accuracy 0.97, mean
score 0.75 (label 1) vs 0.18 (label 0) after the fixed 32 steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed training configuration — part of the cross-engine contract
ITERS = 32
LR = 8.0  # power of two: the update multiply is exact

#: monotonic suffix for the GD loop's temp view — session-global names
#: keyed on id() can collide after GC (ADVICE r12 on the kmeans view)
_VIEW_IDS = __import__("itertools").count()


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, x1..x3, y — the training matrix. x1/x2 are dyadic
    rescalings (exact); x3 is one exactly-rounded division."""
    toks = f"regexp_extract_all(lower({text_col}), '\\\\S+', 0)"
    f = docs.select(
        "doc_id",
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.length(
            F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
        ).cast("long").alias("n_chars"),
        F.expr(f"size(array_distinct({toks}))").cast("long").alias("n_distinct"),
    ).filter(F.col("n_tokens") > 0)
    return f.select(
        "doc_id",
        (F.col("n_tokens").cast("double") / F.lit(256.0) - F.lit(0.25)).alias("x1"),
        (F.col("n_chars").cast("double") / F.lit(2048.0) - F.lit(0.0625)).alias("x2"),
        (
            F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
            - F.lit(0.5)
        ).alias("x3"),
        F.when(F.col("n_distinct") * 2 > F.col("n_tokens"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )


def _z(w: list[float]) -> F.Column:
    """z = ((wb + w1·x1) + w2·x2) + w3·x3 — FIXED parenthesization,
    mirrored in the oracle."""
    return (
        (F.lit(w[0]) + F.lit(w[1]) * F.col("x1"))
        + F.lit(w[2]) * F.col("x2")
    ) + F.lit(w[3]) * F.col("x3")


#: row bound under which the GD loop's per-iteration agg runs on a
#: compacted copy of the (checkpointed) feature table. Rationale
#: (guide §2.2 "fewer, larger partitions"): each iteration is one tiny
#: 1-row aggregate job; on a 32-partition table that job schedules 32
#: partial-agg tasks for microseconds of work each — measured r12: 68
#: jobs/1000+ tasks per training run, wall time dominated by
#: scheduling. Above the bound the loop keeps the table's native
#: parallelism, so at production scale this is a no-op.
_COMPACT_ROWS = 1 << 20
#: row bound below which ONE partition beats any parallelism (the
#: per-task decimal-sum work is smaller than scheduling a second task).
#: r12's coalesce(1) for everything ≤ _COMPACT_ROWS serialized ~450k
#: rows × 32 iterations of DECIMAL(38,12) partial sums onto one core —
#: the driver measured quality_train_score 13.9 s vs its 10.7 pin
#: (VERDICT r12 item 3). Between the two bounds the table compacts to
#: _COMPACT_PARTS partitions: wide enough to parallelize the decimal
#: sums, narrow enough that per-iteration scheduling stays trivial.
_SERIAL_ROWS = 1 << 12
_COMPACT_PARTS = 8


def _gd_table(feats: DataFrame, n_rows: int | None = None) -> DataFrame:
    """Iteration-loop view of the feature table: compacted (cheap narrow
    re-checkpoint of checkpointed rows) when tiny, untouched otherwise.
    ``n_rows`` lets the caller pass a count it already knows (riding the
    feature checkpoint as an Observation) so no extra count job runs per
    training call — VERDICT r12 item 3. DECIMAL gradient sums are
    order-free exact, so partitioning never changes the trajectory. The
    GD loop reads only (x1, x2, x3, y); doc_id is projected out of the
    compact copy so each iteration scans 4 columns, not 5."""
    if n_rows is None:
        n_rows = feats.count()
    if n_rows > _COMPACT_ROWS:
        return feats
    parts = 1 if n_rows <= _SERIAL_ROWS else _COMPACT_PARTS
    return (
        feats.select("x1", "x2", "x3", "y")
        .coalesce(parts)
        .localCheckpoint(eager=True)
    )


def quality_train(
    feats: DataFrame,
    iters: int = ITERS,
    lr: float = LR,
    n_rows: int | None = None,
) -> list[float]:
    """Fit [wb, w1, w2, w3] by batch GD with the logistic-style update
    g = (p − y)·x under the rational squash. Returns the final weights;
    the trajectory is deterministic (see module docstring). ``n_rows``
    (when the caller already knows the row count) skips the compaction
    decision's count job."""
    feats = _gd_table(feats, n_rows)
    # r13 (guide §7.3 driver-side work — the r12 kmeans lesson applied
    # here): each iteration used to build ~40 py4j Column objects and
    # re-analyze the resulting plan — profiled at sf0.1: 7.0 s
    # construct, of which only 2.3 s was Spark jobs; ~4.7 s was
    # driver-side construction across the 32 iterations. One spark.sql
    # string per iteration is a single py4j call + one parse. The SQL
    # expression tree (fixed-parenthesization z, rational squash,
    # round-12 DECIMAL(38,12) sums, CAST(count(1) AS DOUBLE)) is the
    # same operators in the same order as the Column form, so the
    # trajectory — and the oracle hash — is unchanged. Weight literals
    # round-trip exactly: repr() emits the shortest decimal that parses
    # back to the same IEEE double, and the D suffix keeps Spark from
    # reading them as DECIMAL.
    spark = feats.sparkSession
    view = f"__quality_gd_{next(_VIEW_IDS)}"
    feats.createOrReplaceTempView(view)
    w = [0.0, 0.0, 0.0, 0.0]
    try:
        for _ in range(iters):
            wl = [f"{x!r}D" for x in w]
            z = f"(({wl[0]} + {wl[1]} * x1) + {wl[2]} * x2) + {wl[3]} * x3"
            row = spark.sql(
                "SELECT sum(CAST(round(g, 12) AS DECIMAL(38,12))) AS sb,"
                " sum(CAST(round(g * x1, 12) AS DECIMAL(38,12))) AS s1,"
                " sum(CAST(round(g * x2, 12) AS DECIMAL(38,12))) AS s2,"
                " sum(CAST(round(g * x3, 12) AS DECIMAL(38,12))) AS s3,"
                " CAST(count(1) AS DOUBLE) AS n FROM ("
                "SELECT (0.5D + 0.5D * (z / (1.0D + abs(z))))"
                " - CAST(y AS DOUBLE) AS g, x1, x2, x3 FROM ("
                f"SELECT {z} AS z, x1, x2, x3, y FROM {view}))"
            ).collect()[0]
            n = row["n"]
            w = [
                w[0] - lr * (float(row["sb"]) / n),
                w[1] - lr * (float(row["s1"]) / n),
                w[2] - lr * (float(row["s2"]) / n),
                w[3] - lr * (float(row["s3"]) / n),
            ]
    finally:
        spark.catalog.dropTempView(view)
    return w


def quality_train_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train on the corpus, then score it: (doc_id, label, score, keep).
    score = the squashed probability under the learned weights; keep =
    score > 0.5. The feature table is localCheckpointed so the text
    parse runs once, not once per GD iteration + once at inference; the
    row count the compaction decision needs rides that checkpoint job
    as an Observation (no separate count job — guide §1.2)."""
    from pyspark.sql import Observation

    obs = Observation()
    feats = (
        quality_features(docs, text_col)
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    w = quality_train(feats, n_rows=int(obs.get["n"]))
    z = _z(w)
    a = F.lit(1.0) + F.abs(z)
    score = F.lit(0.5) + F.lit(0.5) * (z / a)
    return feats.select(
        "doc_id",
        F.col("y").alias("label"),
        score.alias("score"),
        (score > F.lit(0.5)).alias("keep"),
    )


def quality_holdout_eval(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """TRAIN/TEST discipline for the learned filter: fit on the 90%
    train split (doc_id % 10 < 9 — the repo's standard split key),
    score the HELD-OUT 10%, and report the integer-exact confusion
    matrix plus accuracy / precision / recall / F1 — the
    generalization audit a production quality filter ships with
    (training-set accuracy alone rewards memorization; the planted
    label here is a pure feature function, so held-out performance
    measures the GD fit, not leakage). Rate divisions are single
    exactly-rounded double ops with zero-denominator guards; counts
    are BIGINT. The train-split row count rides the feature checkpoint
    job as an Observation, so neither the compaction decision nor the
    ``n_train`` output column costs a separate count job (VERDICT r12
    items 3/6 — the old form ran feats.count() + train.count() as two
    extra jobs per query)."""
    from pyspark.sql import Observation

    obs = Observation()
    feats = (
        quality_features(docs, text_col)
        .observe(
            obs,
            F.sum((F.col("doc_id") % 10 < 9).cast("long")).alias("n_train"),
        )
        .localCheckpoint(eager=True)
    )
    train = feats.filter(F.col("doc_id") % 10 < 9)
    test = feats.filter(F.col("doc_id") % 10 == 9)
    n_train = int(obs.get["n_train"] or 0)
    w = quality_train(train, n_rows=n_train)
    z = _z(w)
    a = F.lit(1.0) + F.abs(z)
    score = F.lit(0.5) + F.lit(0.5) * (z / a)
    pred = (score > F.lit(0.5)).cast("long")
    cm = test.select(pred.alias("pred"), "y").agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
    )
    n_test = (F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn")).cast("long")
    return cm.select(
        F.lit(n_train).cast("long").alias("n_train"),
        n_test.alias("n_test"),
        "tp", "fp", "tn", "fn",
        ((F.col("tp") + F.col("tn")).cast("double") / n_test.cast("double")).alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
            F.lit(2.0) * (prec * rec) / (prec + rec),
        ).alias("f1"),
    )


def quality_gd_oracle(
    iters: int = ITERS, lr: float = LR, holdout: bool = False
) -> str:
    """The unrolled-trajectory DuckDB oracle: one gradient CTE + one
    update CTE per GD step, replaying quality_train bit-for-bit, then
    either the inference projection under the final weights
    (``holdout=False`` — quality_train_score's twin) or the held-out
    confusion matrix + rates (``holdout=True`` — quality_holdout_eval's
    twin: GD runs over the 90% split, metrics over the 10%)."""
    head = r"""WITH f AS MATERIALIZED (
  SELECT doc_id,
         CAST(n_tokens AS DOUBLE) / 256.0 - 0.25 AS x1,
         CAST(n_chars AS DOUBLE) / 2048.0 - 0.0625 AS x2,
         CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) - 0.5 AS x3,
         CAST(CASE WHEN n_distinct * 2 > n_tokens
              THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM (
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '\S+')) AS n_tokens,
           length(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS n_chars,
           len(list_distinct(regexp_extract_all(lower(text), '\S+'))) AS n_distinct
    FROM documents
  ) WHERE n_tokens > 0
),
w0 AS (SELECT 0.0::DOUBLE AS wb, 0.0::DOUBLE AS w1,
              0.0::DOUBLE AS w2, 0.0::DOUBLE AS w3)"""
    if holdout:
        head += """,
ftrain AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 10 < 9)"""
    train_src = "ftrain" if holdout else "f"
    step = """,
g{t} AS MATERIALIZED (
  SELECT CAST(sum(CAST(round(g, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb,
         CAST(sum(CAST(round(g * x1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
         CAST(sum(CAST(round(g * x2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s2,
         CAST(sum(CAST(round(g * x3, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s3,
         CAST(count(*) AS DOUBLE) AS n
  FROM (
    SELECT p - CAST(y AS DOUBLE) AS g, x1, x2, x3
    FROM (
      SELECT y, x1, x2, x3,
             0.5 + 0.5 * (z / (1.0 + abs(z))) AS p, z
      FROM (SELECT {train_src}.*, ((wb + w1 * x1) + w2 * x2) + w3 * x3 AS z
            FROM {train_src}, w{t})
    )
  )
),
w{t1} AS MATERIALIZED (
  SELECT wb - {lr} * (sb / n) AS wb, w1 - {lr} * (s1 / n) AS w1,
         w2 - {lr} * (s2 / n) AS w2, w3 - {lr} * (s3 / n) AS w3
  FROM w{t}, g{t}
)"""
    body = "".join(
        step.format(t=t, t1=t + 1, lr=lr, train_src=train_src)
        for t in range(iters)
    )
    if holdout:
        tail = f"""
,cm AS (
  SELECT CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM (
    SELECT y,
           CAST(0.5 + 0.5 * (z / (1.0 + abs(z))) > 0.5 AS BIGINT) AS pred
    FROM (SELECT f.*, ((wb + w1 * x1) + w2 * x2) + w3 * x3 AS z
          FROM f, w{iters})
    WHERE doc_id % 10 = 9
  )
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM ftrain)
SELECT n_train, tp + fp + tn + fn AS n_test, tp, fp, tn, fn,
       CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE) AS accuracy,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN (tp + fp > 0) AND (tp + fn > 0)
             AND (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                  + CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)) > 0
            THEN 2.0 * ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
                        * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)))
                 / (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                    + CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
       END AS f1
FROM cm, nt"""
    else:
        tail = f"""
SELECT doc_id, y AS label,
       0.5 + 0.5 * (z / (1.0 + abs(z))) AS score,
       0.5 + 0.5 * (z / (1.0 + abs(z))) > 0.5 AS keep
FROM (SELECT f.*, ((wb + w1 * x1) + w2 * x2) + w3 * x3 AS z
      FROM f, w{iters})"""
    return head + body + tail
