"""PageRank — the iterative-join sibling of connected components (the
other classic "many rounds over one edge table" workload a 100 TB
analytics engine must run without driver-side graph state).

Spark-first: each iteration is ONE edge⋈rank join + one dst-grain
aggregate — the edge table is the fact (shuffled on src, then dst), the
rank table is node-grain (small relative to edges; broadcastable for
dimension-sized graphs, co-partitioned for web-scale ones). Iterations
unroll into the logical plan (bounded iters) — for long runs compose
with the CC module's round checkpointer to keep lineage flat.

Float discipline (the part that makes the unrolled DuckDB oracle hash
EXACT, see CORRECTNESS rules): per-edge contributions are a single
double division ROUNDED to the 12-dp grid and cast to DECIMAL(32,12);
the per-node in-sum is then an EXACT decimal aggregate (order-free);
the damping update is two single IEEE ops on that exact sum, re-snapped
to the grid. Every iteration therefore produces bit-identical ranks in
any engine that follows the same recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 12  # decimal places of the rank grid


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Ranks after ``iters`` power iterations on a DIRECTED edge list
    (feed both directions for an undirected graph). Nodes = every id
    appearing as src or dst; sinks (no out-edges) simply contribute
    nothing (no dangling redistribution — fine for the symmetric graphs
    this registry feeds; document if used on asymmetric ones).

    Output: (node, rank) with rank a 12-dp-grid double, summing to ≤ 1.

    ``broadcast_ranks``: hint the node-grain side of every per-round
    join as broadcast — right whenever nodes ≪ edges (dimension-sized
    graphs like the item graph: localCheckpointed inputs carry no
    stats, so Spark falls to SortMergeJoin without the hint). Leave
    False for web-scale graphs where ranks must shuffle-join.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if materialize:
        # the edge subtree feeds EVERY iteration's join plus nodes/deg —
        # unrolled lazily it re-derives per consumer (measured: the
        # 3-iteration registry query planned 105 exchanges / 9 SMJs;
        # materialized: the edge build runs once and each round starts
        # from a flat scan). Same eager-at-construction contract as the
        # CC loop's round checkpointer.
        e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    if materialize:
        nodes = nodes.localCheckpoint()
        deg = deg.localCheckpoint()
    n_df = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    # rank0 = round(1/N, 12): one double division + half-away round —
    # engine-identical
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node",
        "n_nodes",
        F.round(F.lit(1.0) / F.col("n_nodes"), GRID)
        .cast(f"decimal(32,{GRID})")
        .alias("rank"),
    )
    for _ in range(iters):
        rank_side = ranks.select(F.col("node").alias("src"), "rank")
        deg_side = deg
        if broadcast_ranks:
            rank_side = F.broadcast(rank_side)
            deg_side = F.broadcast(deg_side)
        contribs = (
            e.join(rank_side, "src")
            .join(deg_side, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(
                    F.col("rank").cast("double") / F.col("out_deg"), GRID
                )
                .cast(f"decimal(32,{GRID})")
                .alias("contrib"),
            )
        )
        in_sums = contribs.groupBy("node").agg(
            F.sum("contrib").alias("in_sum")  # EXACT decimal aggregate
        )
        ranks = (
            ranks.select("node", "n_nodes")
            .join(F.broadcast(in_sums) if broadcast_ranks else in_sums, "node", "left")
            .select(
                "node",
                "n_nodes",
                F.round(
                    (F.lit(1.0) - F.lit(damping)) / F.col("n_nodes")
                    + F.lit(damping)
                    * F.coalesce(F.col("in_sum").cast("double"), F.lit(0.0)),
                    GRID,
                )
                .cast(f"decimal(32,{GRID})")
                .alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").cast("double").alias("rank"))
