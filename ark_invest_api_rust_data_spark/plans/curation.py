"""Curation-operator probes (SURVEY.md §2 B29/B31 extensions): exact
cross-document substring dedup (Lee et al. 2022), hashed linear
classifier quality scoring, per-domain caps, and deterministic shard
assignment — each hash-compared against a DuckDB oracle recomputing
the identical integer math (see operators/curation.py for the
determinism contracts and 100 TB shuffle shapes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.curation import (
    classifier_score,
    domain_cap,
    duplicated_spans,
    shard_assign,
)
from .base import Probe
from .llm import _sql_hash

_W = "string_split_regex(trim(text), '\\s+')"


# ------------------------------------------------- substring dedup
def llm_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """B29 — exact cross-doc substring dedup (k=8 token grams): gram
    occurrence min/max detects cross-doc repeats without countDistinct,
    the union of duplicated [pos, pos+k) spans folds over sorted
    positions (equal-length intervals: each adds min(k, gap)), and the
    keep decision is the Lee-et-al 50% coverage cut as an integer
    compare."""
    return duplicated_spans(load_table(spark, sf, "documents"), k=8, max_frac=0.5)


LLM_SUBSTRING_DEDUP_SQL = f"""
WITH n AS (SELECT doc_id, {_W} AS w, len({_W}) AS n FROM documents),
g AS (SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(w, i, i + 7), ' ') AS gram
      FROM n, unnest(generate_series(1, n - 7)) AS t(i) WHERE n >= 8),
dup AS (SELECT gram FROM (
        SELECT gram, min(doc_id) AS mn, max(doc_id) AS mx FROM g GROUP BY gram)
        WHERE mn != mx),
p AS (SELECT doc_id, list(pos ORDER BY pos) AS ps, count(*) AS m
      FROM g JOIN dup USING (gram) GROUP BY doc_id),
cov AS (SELECT doc_id, m,
        CASE WHEN m >= 2 THEN 8 + list_sum(list_transform(
               generate_series(2, m), j -> least(8, ps[j] - ps[j - 1])))
             ELSE 8 END AS covered
        FROM p)
SELECT n.doc_id,
  CAST(n.n AS BIGINT) AS n_tokens,
  CAST(coalesce(cov.m, 0) AS BIGINT) AS dup_grams,
  CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
  CAST(coalesce(cov.covered, 0) AS DOUBLE) / CAST(n.n AS DOUBLE) AS dup_frac,
  coalesce(cov.covered, 0) * 1048576 < n.n * 524288 AS kept
FROM n LEFT JOIN cov USING (doc_id)
"""


# ------------------------------------------------- classifier score
def llm_classifier_score(spark: SparkSession, sf: str) -> DataFrame:
    """B31 — hashing-trick linear classifier (fastText-shape quality
    model, deterministic public weights): per-token bucket weights sum
    to an exact int64 document score; zero-shuffle narrow fold vs the
    oracle's unnest-and-regroup — same math, different physical shape."""
    return classifier_score(load_table(spark, sf, "documents"), buckets=2048)


_WT = f"(coalesce({_sql_hash('tok')}, 0) * 1103515245 + 12345) % 2048 - 1024"
LLM_CLASSIFIER_SCORE_SQL = f"""
WITH t AS (SELECT doc_id, unnest({_W}) AS tok FROM documents),
w AS (SELECT doc_id, {_WT} AS wt FROM t)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(wt) AS BIGINT) AS score_int,
  CAST(sum(wt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_weight,
  CAST(sum(wt) AS BIGINT) >= 0 AS kept
FROM w GROUP BY doc_id
"""


# ------------------------------------------------- per-domain cap
def llm_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """B31 — per-domain document cap (cap=10): md5-of-id deterministic
    order, one window shuffle on the domain key; every id is emitted
    with its rank so the probe pins the full keep/drop decision."""
    return domain_cap(load_table(spark, sf, "documents"), cap=10)


LLM_DOMAIN_CAP_SQL = """
SELECT doc_id, source, rk, rk <= 10 AS kept FROM (
  SELECT doc_id, source,
    CAST(row_number() OVER (
      PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents)
"""


def llm_domain_cap_sharded(spark: SparkSession, sf: str) -> DataFrame:
    """B31 — the SKEW-SAFE domain-cap tier (VERDICT r3 #3a): cap per
    (domain, md5-prefix shard) first, re-cap the bounded survivor set.
    Kept set and kept-row ranks are provably identical to the global
    window, so the oracle is the SAME global-window SQL with rk masked
    to kept rows (the tier doesn't compute dropped rows' global
    ranks — that's the skewed window it exists to avoid)."""
    return domain_cap(
        load_table(spark, sf, "documents"), cap=10, tier="sharded", shards=16
    )


LLM_DOMAIN_CAP_SHARDED_SQL = """
SELECT doc_id, source, CASE WHEN rk <= 10 THEN rk END AS rk,
  rk <= 10 AS kept FROM (
  SELECT doc_id, source,
    CAST(row_number() OVER (
      PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents)
"""


# ------------------------------------------------- shard assignment
def llm_shard_assign(spark: SparkSession, sf: str) -> DataFrame:
    """B31 — deterministic training-export sharding (16 shards): Knuth
    multiplicative shard hash + independent within-shard order mix,
    one window shuffle; reproducible across engines and reruns."""
    return shard_assign(load_table(spark, sf, "documents"), n_shards=16)


LLM_SHARD_ASSIGN_SQL = """
SELECT doc_id, shard,
  CAST(row_number() OVER (PARTITION BY shard ORDER BY mix, doc_id) AS BIGINT) AS pos
FROM (
  SELECT doc_id,
    CAST((doc_id * 2654435761) % 4294967296 % 16 AS BIGINT) AS shard,
    (doc_id * 1103515245 + 12345) % 2147483648 AS mix
  FROM documents)
"""


# ------------------------------------------ α-temperature mixture
_TMIX_BUDGET = 500


def llm_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """B31 — α-temperature domain mixture (operators/sampling.py
    temperature_mix, α=0.5, budget=500): per-domain quotas derived
    from the corpus itself (⌊budget·√n_d / Σ√n⌋ — the multilingual-
    pretraining upsampling rule), docs picked hash-first per domain.
    The normalizer folds left-to-right over name-sorted domains so
    both engines sum the doubles in the same order; √ is IEEE-exact;
    the hash compare pins quota derivation AND the picked set."""
    from ..operators.sampling import temperature_mix

    return temperature_mix(
        load_table(spark, sf, "documents"), budget=_TMIX_BUDGET, alpha=0.5
    )


LLM_TEMPERATURE_MIX_SQL = f"""
WITH c AS (SELECT source, count(*) AS domain_n FROM documents GROUP BY source),
w AS (SELECT source, domain_n, sqrt(CAST(domain_n AS DOUBLE)) AS w FROM c),
t AS (SELECT list_reduce(list(w ORDER BY source), (a, b) -> a + b) AS total FROM w),
q AS (SELECT source, domain_n,
        CAST(floor({_TMIX_BUDGET}.0 * w / total) AS BIGINT) AS quota
      FROM w CROSS JOIN t),
r AS (SELECT source, doc_id,
        CAST(row_number() OVER (
          PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pick_rank
      FROM documents)
SELECT r.source, r.doc_id, r.pick_rank, q.domain_n, q.quota
FROM r JOIN q USING (source) WHERE pick_rank <= quota
"""


PROBES = [
    Probe("llm_substring_dedup", "B29", llm_substring_dedup, LLM_SUBSTRING_DEDUP_SQL),
    Probe("llm_temperature_mix", "B31", llm_temperature_mix, LLM_TEMPERATURE_MIX_SQL),
    Probe("llm_classifier_score", "B31", llm_classifier_score, LLM_CLASSIFIER_SCORE_SQL),
    Probe("llm_domain_cap", "B31", llm_domain_cap, LLM_DOMAIN_CAP_SQL),
    Probe(
        "llm_domain_cap_sharded", "B31",
        llm_domain_cap_sharded, LLM_DOMAIN_CAP_SHARDED_SQL,
    ),
    Probe("llm_shard_assign", "B31", llm_shard_assign, LLM_SHARD_ASSIGN_SQL),
]


_GS_K = 5


def llm_group_sample(spark: SparkSession, sf: str) -> DataFrame:
    """B31 extension — deterministic k-per-group sampling
    (operators/sampling.group_sample): 5 docs per source domain by id
    hash order, the reproducible eval-set constructor. Salted
    two-phase top-k, so no group ever concentrates its full row set
    on one reducer."""
    from ..operators.sampling import group_sample

    docs = load_table(spark, sf, "documents")
    return group_sample(docs, k=_GS_K, group_col="source", id_col="doc_id")


def _group_sample_sql() -> str:
    from .llm import _sql_hash

    h = _sql_hash("CAST(doc_id AS VARCHAR)")
    return f"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY {h}, doc_id) AS sample_rank
  FROM documents)
SELECT source, doc_id, sample_rank FROM r WHERE sample_rank <= {_GS_K}
"""


PROBES.append(
    Probe("llm_group_sample", "B31", llm_group_sample, _group_sample_sql())
)


def llm_corpus_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """B31 capstone #2 — the pipeline-observability funnel
    (operators/curation.corpus_funnel): docs and tokens surviving raw
    → quality → exact dedup → train split, computed in ONE corpus
    pass (per-doc flags, stage explode, O(stages) combine). The
    report that makes a week-over-week corpus shrink attributable to
    a stage. Oracle chains the capstone's stage CTEs and counts each
    one."""
    from ..operators.curation import corpus_funnel

    return corpus_funnel(load_table(spark, sf, "documents"))


def _funnel_sql() -> str:
    from .llm import LLM_PIPELINE_SQL

    prefix = LLM_PIPELINE_SQL.split("sized AS")[0].rstrip().rstrip(",")
    return f"""{prefix},
tok AS (SELECT doc_id, len({_W}) AS n_tokens FROM documents)
-- HAVING count(*) > 0 on every branch: the Spark side's
-- explode+filter+groupBy emits NO row for an empty stage, while a
-- bare ungrouped aggregate would emit (stage, order, 0, NULL) —
-- the branches must agree when quality/dedup/train empties at some
-- SF (r8 advisor finding)
SELECT 'raw' AS stage, 0 AS stage_order,
       count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM tok HAVING count(*) > 0
UNION ALL
SELECT 'quality', 1, count(*), CAST(SUM(n_tokens) AS BIGINT)
FROM tok JOIN kept USING (doc_id) HAVING count(*) > 0
UNION ALL
SELECT 'dedup', 2, count(*), CAST(SUM(n_tokens) AS BIGINT)
FROM tok JOIN deduped USING (doc_id) HAVING count(*) > 0
UNION ALL
SELECT 'train', 3, count(*), CAST(SUM(n_tokens) AS BIGINT)
FROM tok JOIN train USING (doc_id) HAVING count(*) > 0
"""


PROBES.append(
    Probe("llm_corpus_funnel", "B31", llm_corpus_funnel, _funnel_sql())
)
