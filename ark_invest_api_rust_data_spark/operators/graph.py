"""Distributed link analysis: exact integer PageRank.

A large-scale pretraining pipeline scores web documents by the link
structure of their hosts (Common-Crawl-style host-level PageRank feeds
quality filters).  The reference repo has no graph surface (SURVEY §2
Part-B evidence-of-absence), so this is a training-pipeline extension
row, built the same way as the exact k-means (operators/clustering.py):
every arithmetic step is int64, so the full iterative algorithm
hash-matches a DuckDB oracle that unrolls the iterations as CTEs — an
iterative graph algorithm with a FULL SQL oracle, no rows-only
concession.

Fixed-point contract (documented, mirrored by plans/graph.py's oracle
generator):

- ranks are int64 scaled by ``base`` (default 10^15);
- ``r0(v) = base div n`` for every node (n = |V|);
- each iteration: ``contrib(u→v) = r(u) div deg_out(u)`` per edge
  (multigraph: parallel edges each carry one contribution),
  ``r'(v) = (15·(base div n)) div 100 + (85·Σ contrib) div 100``
  (damping 0.85 as the rational 85/100 — no floats anywhere);
- dangling nodes (no out-edges) drop their mass, the standard
  "dangling mass discarded" PageRank variant;
- all values stay ≤ base, so ``85·Σ`` ≤ 8.5e16 ≪ int64 max.

Scale design (100 TB / 1000 executors): the edge list is joined with
out-degrees once, hash-partitioned on ``src`` and persisted — every
iteration reuses that partitioning for the rank join (no re-exchange of
the edge side), pays ONE shuffle (the ``groupBy(dst)`` contribution
sum, map-side combined), and truncates lineage with an eager
localCheckpoint so the plan does not grow with the iteration count.
The only driver crossing is the single |V| scalar.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    base: int = 10**15,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact integer PageRank over a directed multigraph.

    ``edges`` is a DataFrame of (src, dst) int64 pairs; returns
    (node, rank) with rank int64-scaled by ``base``.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    # persisted: every iteration's teleport left-join reuses the node
    # set — without it each iteration re-runs the distinct shuffle
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded driver crossing: one scalar (|V|)
    if n == 0:
        nodes.unpersist()
        raise ValueError("pagerank: empty edge list")
    r0 = base // n
    tele = (15 * r0) // 100

    deg = edges.groupBy(src_col).agg(F.count("*").alias("deg"))
    # One-time co-location: edge+degree side hash-partitioned on src;
    # every iteration's rank join reuses this partitioning.
    ed = (
        edges.join(deg, src_col)
        .select(src.alias("src"), dst.alias("dst"), "deg")
        .repartition("src")
        .persist()
    )
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    try:
        for _ in range(iters):
            contrib = (
                ed.join(ranks, ed["src"] == ranks["node"])
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank div deg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("s"))
            )
            ranks = (
                nodes.join(contrib, "node", "left")
                .select(
                    "node",
                    F.expr(
                        f"CAST({tele} + (85 * coalesce(s, 0)) div 100 AS BIGINT)"
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)  # truncate iteration lineage
            )
        return ranks
    finally:
        ed.unpersist()
        nodes.unpersist()


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    seq_col: str = "l_linenumber",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Directed co-purchase edges: within each order (sorted by line
    number), an edge from each item to the next one; self-loops
    dropped.  One window shuffle on the order key — the standard
    sessionized-sequence → graph derivation.

    The sort is (seq, item): the synthetic testdata has duplicate
    line numbers within an order, and a seq-only sort would leave the
    lead() order engine-defined — the item tiebreaker makes the edge
    multiset deterministic (rows equal on both keys are
    interchangeable)."""
    from pyspark.sql import Window

    w = Window.partitionBy(order_col).orderBy(seq_col, item_col)
    return (
        lineitem.select(
            F.col(item_col).alias("src"),
            F.lead(item_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )
