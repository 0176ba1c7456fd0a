"""Retrieval + entity-matching probes: exact-integer BM25 top-k
(operators/bm25.py) and blocked fuzzy entity resolution
(operators/entity.py).  Both hash-match full SQL oracles — BM25's idf
is the one transcendental, computed in CPython/libm on the driver so
it is bit-identical to DuckDB's ln (the JVM's Math.log is not; see
operators/bm25.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.bm25 import bm25_topk
from ..operators.entity import fuzzy_best_match
from .base import Probe
from .llm import _W

PROBES: list[Probe] = []

_QUERY = ["spark", "hash", "merge", "window", "scan"]
_TOPK = 10


def llm_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """B31 extension — BM25 keyword retrieval over the corpus
    (k1=1.2, b=0.75 as exact rationals, idf quantized floor(ln·2^20)).
    Top-10 by int64 score, ties broken on doc_id."""
    docs = load_table(spark, sf, "documents")
    return bm25_topk(docs, _QUERY, k=_TOPK)


_TERMS_SQL = ", ".join(f"'{t}'" for t in _QUERY)

LLM_BM25_SQL = f"""
WITH t AS (SELECT doc_id, {_W} AS w FROM documents),
d AS (SELECT doc_id AS id, len(w) AS dl, w FROM t),
g AS (SELECT count(*) AS n, sum(dl) AS l FROM d),
a AS (SELECT n, l, (1000000 * l) // n AS avg_q FROM g),
tok AS (SELECT id, dl, unnest(w) AS term FROM d),
tf AS (SELECT id, dl, term, count(*) AS tf FROM tok
       WHERE term IN ({_TERMS_SQL}) GROUP BY 1, 2, 3),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
idf AS (SELECT term,
        CAST(floor(ln(1.0 + (a.n - df + 0.5) / (df + 0.5)) * 1048576.0)
             AS BIGINT) AS idf_q
        FROM dfx CROSS JOIN a),
s AS (SELECT id,
      sum((idf_q * 44 * tf * avg_q) //
          (20 * tf * avg_q + 6 * avg_q + 18000000 * dl)) AS score
      FROM tf JOIN idf USING (term) CROSS JOIN a GROUP BY 1),
r AS (SELECT id, score,
      row_number() OVER (ORDER BY score DESC, id) AS rank FROM s)
SELECT id AS doc_id, CAST(score AS BIGINT) AS score, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {_TOPK}
"""

PROBES.append(Probe("llm_bm25_topk", "B31", llm_bm25_topk, LLM_BM25_SQL))


# ------------------------------------------------ hybrid retrieval
def llm_hybrid_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """B30/B31 composition — hybrid retrieval: BM25 top-10 (lexical)
    fused with cosine top-10 for the vec_id=0 query (dense, shared
    doc_id==vec_id space in the synthetic data) by integer
    reciprocal-rank fusion (operators/bm25.rrf_fuse, k0=60,
    scale=2^20). Final top-10 by (rrf_score DESC, doc_id). The oracle
    nests the two tiers' EXISTING oracle statements as CTEs, so any
    drift in either ranking chain surfaces here too."""
    from pyspark.sql import Window

    from ..operators.bm25 import rrf_fuse
    from ..operators.similarity import cosine_topk

    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    lex = bm25_topk(docs, _QUERY, k=_TOPK).select("doc_id", "rank")
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    dtop = cosine_topk(emb, qv, k=_TOPK, exclude_ids=(0,))
    wd = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    dense = (
        dtop.withColumn("rank", F.row_number().over(wd))
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    fused = rrf_fuse([lex, dense])
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("doc_id", "rrf_score", "n_systems", "rank")
    )


def _hybrid_sql() -> str:
    from .llm import LLM_SIMILARITY_SQL

    return f"""
WITH lex AS ({LLM_BM25_SQL}),
dense AS ({LLM_SIMILARITY_SQL}),
u AS (
  SELECT doc_id, 1048576 // (60 + rank) AS c FROM lex
  UNION ALL
  SELECT vec_id AS doc_id, 1048576 // (60 + rank) AS c FROM dense),
s AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score,
         CAST(count(*) AS BIGINT) AS n_systems
  FROM u GROUP BY doc_id),
r AS (
  SELECT doc_id, rrf_score, n_systems,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
  FROM s)
SELECT doc_id, rrf_score, n_systems, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {_TOPK}
"""


PROBES.append(
    Probe("llm_hybrid_retrieval", "B30", llm_hybrid_retrieval, _hybrid_sql())
)


# ------------------------------------------------ fuzzy entity match
_DIRTY_CASE = """CASE p_partkey % 3
  WHEN 0 THEN substring(p_name, 1, length(p_name) - 1)
  WHEN 1 THEN concat('x', substring(p_name, 2))
  ELSE p_name END"""


def er_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    """B15 scale tier — entity resolution of a dirty name batch
    (deterministic planted edits: dropped last char / replaced first
    char) against the part catalog via prefix/suffix blocking +
    Levenshtein best-match — the fuzzy generalization of the
    reference's per-typo company rule chain, without the O(n·m) cross
    join."""
    part = load_table(spark, sf, "part")
    dirty = part.filter(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("dirty_id"),
        F.expr(_DIRTY_CASE).alias("dirty_name"),
    )
    catalog = part.select(
        F.col("p_partkey").alias("match_id"),
        F.col("p_name").alias("match_name"),
    )
    out = fuzzy_best_match(dirty, catalog, max_dist=2, block_len=4)
    return out.withColumn("dist", F.col("dist").cast("int"))


ER_FUZZY_SQL = f"""
WITH dirty AS (
  SELECT p_partkey AS dirty_id, {_DIRTY_CASE} AS dirty_name
  FROM part WHERE p_partkey % 7 = 0),
cat AS (SELECT p_partkey AS match_id, p_name AS match_name FROM part),
dk AS (SELECT *, substring(dirty_name, 1, 4) AS bp,
              right(dirty_name, 4) AS bs FROM dirty),
ck AS (SELECT *, substring(match_name, 1, 4) AS bp,
              right(match_name, 4) AS bs FROM cat),
cand AS (
  SELECT DISTINCT dirty_id, dirty_name, match_id, match_name FROM (
    SELECT dk.dirty_id, dk.dirty_name, ck.match_id, ck.match_name
    FROM dk JOIN ck USING (bp)
    UNION ALL
    SELECT dk.dirty_id, dk.dirty_name, ck.match_id, ck.match_name
    FROM dk JOIN ck ON dk.bs = ck.bs)),
v AS (SELECT *, levenshtein(dirty_name, match_name) AS dist FROM cand),
r AS (SELECT *, row_number() OVER (PARTITION BY dirty_id
                                   ORDER BY dist, match_id) AS rn
      FROM v WHERE dist <= 2)
SELECT dirty_id, dirty_name, match_id, match_name, CAST(dist AS INT) AS dist
FROM r WHERE rn = 1
"""

PROBES.append(Probe("er_fuzzy_match", "B15", er_fuzzy_match, ER_FUZZY_SQL))


# ------------------------------------------------ inverted index
def llm_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """B31 extension — inverted-index build (BM25's index side): per
    term the document frequency and the first 20 sorted posting ids.
    Distinct pairs → one term shuffle; capped arrays keep groups
    bounded."""
    from ..operators.bm25 import inverted_index

    docs = load_table(spark, sf, "documents")
    return inverted_index(docs, postings_cap=20)


LLM_INVERTED_INDEX_SQL = f"""
WITH p AS (SELECT DISTINCT doc_id AS id, unnest({_W}) AS term
           FROM documents)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       (list(id ORDER BY id))[1:20] AS postings
FROM p GROUP BY term
"""

PROBES.append(
    Probe("llm_inverted_index", "B31", llm_inverted_index, LLM_INVERTED_INDEX_SQL)
)


# ---------------------------------------------------------- MMR rerank
_MMR_K = 4
_MMR_POOL = 8
_MMR_NUM, _MMR_DEN = 7, 10
_MMR_NQ = 3  # queries = vec_id < 3, corpus = the rest


def llm_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """B30 extension — Maximal Marginal Relevance diversity reranking
    (operators/similarity.py mmr_rerank): per query, greedy top-4
    from an exact top-8 cosine pool, score 7·rel − 3·max-sim-to-
    selected on the floor(cos·1e9) fixed-point grid. The RAG context
    stage between retrieval and the prompt window; every round is
    integer-exact so the unrolled SQL oracle replays the selection
    order bit-for-bit."""
    from ..operators.similarity import mmr_rerank

    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < _MMR_NQ)
    data = emb.filter(F.col("vec_id") >= _MMR_NQ)
    return mmr_rerank(
        data, queries, k=_MMR_K, pool=_MMR_POOL,
        lam_num=_MMR_NUM, lam_den=_MMR_DEN,
    )


def _mmr_sql() -> str:
    qd = "CAST(floor(CAST(d.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)"
    qq = "CAST(floor(CAST(q.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)"
    qx = "CAST(floor(CAST(ex.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)"
    qy = "CAST(floor(CAST(ey.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)"
    anti = _MMR_DEN - _MMR_NUM
    parts = [
        f"""sc AS MATERIALIZED (
  SELECT q.vec_id AS query_id, d.vec_id AS vec_id,
    CAST(list_sum(list_transform(generate_series(1, len(d.embedding)),
         i -> {qd} * {qq})) AS DOUBLE)
    / (sqrt(CAST(list_sum(list_transform(generate_series(1, len(d.embedding)),
              i -> {qd} * {qd})) AS DOUBLE))
       * sqrt(CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
              i -> {qq} * {qq})) AS DOUBLE))) AS cosine
  FROM embeddings q JOIN embeddings d
    ON q.vec_id < {_MMR_NQ} AND d.vec_id >= {_MMR_NQ})""",
        f"""p0 AS MATERIALIZED (
  SELECT query_id, vec_id,
         CAST(floor(cosine * 1000000000.0) AS BIGINT) AS qrel
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
  WHERE rnk <= {_MMR_POOL})""",
        f"""pr AS MATERIALIZED (
  SELECT x.query_id, x.vec_id AS a, y.vec_id AS b,
    CAST(floor(
      CAST(list_sum(list_transform(generate_series(1, len(ex.embedding)),
           i -> {qx} * {qy})) AS DOUBLE)
      / (sqrt(CAST(list_sum(list_transform(generate_series(1, len(ex.embedding)),
                i -> {qx} * {qx})) AS DOUBLE))
         * sqrt(CAST(list_sum(list_transform(generate_series(1, len(ey.embedding)),
                i -> {qy} * {qy})) AS DOUBLE)))
      * 1000000000.0) AS BIGINT) AS qsim
  FROM p0 x
  JOIN embeddings ex ON ex.vec_id = x.vec_id
  JOIN p0 y ON y.query_id = x.query_id AND y.vec_id <> x.vec_id
  JOIN embeddings ey ON ey.vec_id = y.vec_id)""",
        f"""s1 AS MATERIALIZED (
  SELECT query_id, vec_id, 1 AS mmr_rank,
         CAST({_MMR_NUM} * qrel AS BIGINT) AS mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY qrel DESC, vec_id) AS rn FROM p0)
  WHERE rn = 1)""",
    ]
    for t in range(2, _MMR_K + 1):
        parts.append(
            f"""m{t} AS MATERIALIZED (
  SELECT pr.query_id, pr.a AS vec_id, max(pr.qsim) AS maxsim
  FROM pr JOIN s{t - 1} s ON s.query_id = pr.query_id AND s.vec_id = pr.b
  GROUP BY 1, 2),
c{t} AS MATERIALIZED (
  SELECT m.query_id, m.vec_id,
         CAST({_MMR_NUM} * p.qrel - {anti} * m.maxsim AS BIGINT) AS mmr
  FROM m{t} m JOIN p0 p ON p.query_id = m.query_id AND p.vec_id = m.vec_id
  WHERE NOT EXISTS (SELECT 1 FROM s{t - 1} s
                    WHERE s.query_id = m.query_id AND s.vec_id = m.vec_id)),
s{t} AS MATERIALIZED (
  SELECT * FROM s{t - 1}
  UNION ALL
  SELECT query_id, vec_id, {t} AS mmr_rank, mmr AS mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY mmr DESC, vec_id) AS rn FROM c{t})
  WHERE rn = 1)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, vec_id, mmr_rank, mmr_score FROM s{_MMR_K}"""
    )


PROBES.append(Probe("llm_mmr_rerank", "B30", llm_mmr_rerank, _mmr_sql()))
