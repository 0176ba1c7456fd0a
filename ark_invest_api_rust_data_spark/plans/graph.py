"""Graph probes: exact integer PageRank over a co-purchase graph
(operators/graph.py).  The oracle unrolls the rank iterations as CTEs
with the identical int64 fixed-point contract — the same
full-SQL-oracle discipline as the exact k-means (plans/corpus.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.graph import copurchase_edges, pagerank
from .base import Probe

PROBES: list[Probe] = []

_ITERS = 5
_BASE = 10**15

# Directed co-purchase edges: within each order (sorted by line
# number) an edge from each part to the next; self-loops dropped.
_EDGES_CTE = """SELECT src, dst FROM (
  SELECT l_partkey AS src,
         lead(l_partkey) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey) AS dst
  FROM lineitem)
WHERE dst IS NOT NULL AND dst <> src"""


def _pagerank_ctes(iters: int = _ITERS, base: int = _BASE) -> str:
    """Unrolled integer PageRank mirroring operators/graph.pagerank
    step for step: r0 = base div n; per iteration the per-edge
    contribution r div deg, a dst-sum, and
    (15·(base div n)) div 100 + (85·s) div 100."""
    parts = [
        f"e AS ({_EDGES_CTE})",
        """nodes AS (SELECT DISTINCT v FROM
  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e))""",
        "g AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        f"r0 AS (SELECT v, {base} // n AS r FROM nodes CROSS JOIN g)",
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""s{it} AS (
  SELECT e.dst AS v, sum(r.r // d.deg) AS s
  FROM e JOIN deg d USING (src) JOIN r{it - 1} r ON r.v = e.src
  GROUP BY 1),
r{it} AS (
  SELECT n0.v,
         (15 * ({base} // g.n)) // 100 + (85 * coalesce(s.s, 0)) // 100 AS r
  FROM nodes n0 CROSS JOIN g LEFT JOIN s{it} s ON s.v = n0.v)"""
        )
    return "WITH " + ",\n".join(parts)


def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """B31 extension — host/item-graph PageRank, the link-analysis
    quality signal a web-scale pretraining pipeline derives before
    filtering (Common-Crawl-style host ranks).  Exact int64 fixed
    point end to end; 5 unrolled iterations hash-match the CTE
    oracle."""
    li = load_table(spark, sf, "lineitem")
    edges = copurchase_edges(li)
    return pagerank(edges, iters=_ITERS, base=_BASE).select(
        F.col("node").cast("long").alias("node"),
        F.col("rank").cast("long").alias("rank"),
    )


GRAPH_PAGERANK_SQL = (
    _pagerank_ctes()
    + f"""
SELECT CAST(v AS BIGINT) AS node, CAST(r AS BIGINT) AS rank FROM r{_ITERS}"""
)

PROBES.append(Probe("graph_pagerank", "B31", graph_pagerank, GRAPH_PAGERANK_SQL))


# ---------------------------------------------- connected components
def graph_components_star(spark: SparkSession, sf: str) -> DataFrame:
    """B29 — the SAME dedup-cluster closure as llm_dedup_clusters, but
    through the alternating large-star/small-star algorithm
    (operators/graph.connected_components): O(log n) rounds regardless
    of graph diameter, vs min-label propagation's O(diameter). Output
    contract identical, so the transitive-closure oracle is shared —
    and the driver gate doubles as a star-vs-propagation equivalence
    check."""
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.graph import connected_components

    pairs = minhash_lsh_pairs(
        load_table(spark, sf, "documents"), threshold=0.5, materialize=True
    )
    return connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("cluster").alias("cluster_id")
    )


def _components_oracle() -> str:
    from .llm import LLM_CLUSTERS_SQL

    return LLM_CLUSTERS_SQL


PROBES.append(
    Probe("graph_components_star", "B29", graph_components_star, _components_oracle())
)


# ---------------------------------------------- triangle counting
def graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """B31 extension — per-node triangle counts over the undirected
    co-purchase graph (operators/graph.triangle_counts): the local
    clustering signal link-quality filters derive. Degree-ordered
    orientation bounds wedge fan-out at O(√m) per node (Suri &
    Vassilvitskii's last-reducer fix); the oracle is the canonical
    three-way self-join."""
    from ..operators.graph import triangle_counts

    li = load_table(spark, sf, "lineitem")
    return triangle_counts(copurchase_edges(li)).select(
        F.col("node").cast("long").alias("node"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


GRAPH_TRIANGLES_SQL = f"""
WITH raw AS ({_EDGES_CTE}),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw),
tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e e1
  JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT CAST(node AS BIGINT) AS node,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT unnest([u, v, w]) AS node FROM tri)
GROUP BY node
"""

PROBES.append(Probe("graph_triangles", "B31", graph_triangles, GRAPH_TRIANGLES_SQL))


# ---------------------------------------------------- k-core decomposition
_KCORE_K = 30
_KCORE_ROUNDS = 12


def graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """B31 extension — k-core peeling of the co-purchase graph
    (operators/graph.kcore): the link-graph density signal next to
    PageRank (low-core = isolated link farms, high-core = the densely
    cross-linked web). Synchronous rounds with the edge-set state
    contract; early-exits at the fixpoint (<= 7 rounds at every test
    SF), which the 12-round unrolled oracle matches because extra
    rounds are identities."""
    from ..operators.graph import kcore

    li = load_table(spark, sf, "lineitem")
    return kcore(copurchase_edges(li), k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _kcore_ctes(k: int, rounds: int) -> str:
    # AS MATERIALIZED: each level is referenced three times (the keep
    # set twice, the peel once) — DuckDB's default CTE inlining would
    # re-evaluate the whole chain 3^rounds times.
    parts = [
        f"""c AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({_EDGES_CTE}))""",
        """n0 AS MATERIALIZED (SELECT a AS u, b AS v FROM c
  UNION ALL SELECT b AS u, a AS v FROM c)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""k{r} AS MATERIALIZED (
  SELECT u FROM n{r - 1} GROUP BY u HAVING count(*) >= {k}),
n{r} AS MATERIALIZED (SELECT n.u, n.v FROM n{r - 1} n
  JOIN k{r} ku ON n.u = ku.u JOIN k{r} kv ON n.v = kv.u)"""
        )
    return "WITH " + ",\n".join(parts)


GRAPH_KCORE_SQL = (
    _kcore_ctes(_KCORE_K, _KCORE_ROUNDS)
    + f"""
SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
FROM n{_KCORE_ROUNDS} GROUP BY u"""
)

PROBES.append(Probe("graph_kcore", "B31", graph_kcore, GRAPH_KCORE_SQL))
