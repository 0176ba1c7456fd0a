"""PageRank (operators/graph.py): exact equality against an
independent pure-Python integer reference, plus the fixed-point
contract's mass and determinism properties."""

from __future__ import annotations

import pytest

from ark_invest_api_rust_data_spark.operators.graph import (
    copurchase_edges,
    pagerank,
)

BASE = 10**15


def _py_pagerank(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Independent reference with the same int64 contract."""
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: BASE // n for v in nodes}
    tele = (15 * (BASE // n)) // 100
    for _ in range(iters):
        s_in: dict[int, int] = {v: 0 for v in nodes}
        for s, d in edges:
            s_in[d] += r[s] // deg[s]
        r = {v: tele + (85 * s_in[v]) // 100 for v in nodes}
    return r


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 3),  # parallel edge
    (5, 1),  # 5 has no in-edges; 2 -> 3 -> 1 cycle-ish
]


@pytest.mark.parametrize("iters", [1, 3, 5])
def test_pagerank_matches_reference(spark, iters):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=iters).collect()}
    assert got == _py_pagerank(EDGES, iters)


def test_pagerank_mass_bounded(spark):
    # dangling/teleport rounding only ever LOSES mass vs base
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    out = pagerank(df, iters=4).collect()
    assert 0 < sum(r["rank"] for r in out) <= BASE


def test_pagerank_empty_raises(spark):
    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df)


def test_copurchase_edges_deterministic_under_ties(spark):
    # duplicate line numbers: the (seq, item) sort must make the edge
    # multiset independent of input row order
    rows = [(1, 1, 10), (1, 1, 12), (1, 2, 11), (2, 1, 7), (2, 1, 7)]
    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    a = spark.createDataFrame(rows, cols)
    b = spark.createDataFrame(list(reversed(rows)), cols)
    ea = sorted(map(tuple, copurchase_edges(a).collect()))
    eb = sorted(map(tuple, copurchase_edges(b).collect()))
    assert ea == eb == [(10, 12), (12, 11)]  # self-loop 7->7 dropped
