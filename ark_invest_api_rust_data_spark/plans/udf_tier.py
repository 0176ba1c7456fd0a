"""UDF-tier probes (SURVEY.md §2 B25–B27) + remaining relational
coverage (full outer join, grouping sets, first/last frames).

The UDF probes deliberately compute something ALSO expressible
natively, and the oracle is the native SQL — so the driver's hash
compare proves the Python tier (Arrow-batched, vectorized) agrees with
the JVM expression tier bit-for-bit. Policy note: UDFs are the slow
path; these exist for API surface and as the pattern for logic Spark
genuinely can't express, not as the way to write b15-style string work.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T

from ..catalog import load_table
from .base import Probe


# ---------------------------------------------------------------- B25
@F.pandas_udf(T.StringType())  # DataType obj: a DDL string would need a live session at import
def _clean_ticker_udf(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow) scalar pandas UDF reproducing the C6 suffix
    cleanup — same rule table as functions/strings.py, in pandas."""
    out = s
    for pat in (" FP", " UQ", " UF", " UN", " UW", "/U", " CN"):
        out = out.str.replace(pat, "", regex=False)
    out = out.str.replace("DKNN", "DKNG", n=1, regex=False)
    return out.str.rstrip()


def b25_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    """B25 — scalar pandas UDF over supplier names (adds a fake
    exchange suffix, strips it back via the UDF); oracle is native
    string SQL."""
    supplier = load_table(spark, sf, "supplier")
    noisy = supplier.select(
        "s_suppkey", F.concat(F.col("s_name"), F.lit(" UW")).alias("noisy")
    )
    return noisy.select("s_suppkey", _clean_ticker_udf(F.col("noisy")).alias("clean"))


B25_SQL = """
SELECT s_suppkey, rtrim(replace(s_name || ' UW', ' UW', '')) AS clean FROM supplier
"""


# ---------------------------------------------------------------- B26
def b26_udtf_split(spark: SparkSession, sf: str) -> DataFrame:
    """B26 — table function: one row per word of p_name with its
    position (posexplode = the built-in UDTF form; a lateral-join
    python UDTF would be the custom variant)."""
    part = load_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
    )


B26_SQL = """
SELECT p_partkey, u.pos - 1 AS pos, u.word
FROM part, (SELECT unnest(string_split(p_name, ' ')) AS word,
                   generate_subscripts(string_split(p_name, ' '), 1) AS pos) u
"""


# ---------------------------------------------------------------- B27
@F.pandas_udf(T.DoubleType())
def _weighted_avg_udaf(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: quantity-weighted average price,
    computed in exact integer cents to match the native-decimal oracle
    bit-for-bit."""
    cents = (price * 100).round().astype("int64")
    q = qty.round().astype("int64")
    num = int((cents * q).sum())
    den = int(q.sum()) * 100
    return float(num) / float(den)


def b27_grouped_agg_udaf(spark: SparkSession, sf: str) -> DataFrame:
    """B27 — custom aggregate via pandas GROUPED_AGG; oracle computes
    the same weighted average natively in exact decimal."""
    lineitem = load_table(spark, sf, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        _weighted_avg_udaf(F.col("l_extendedprice"), F.col("l_quantity")).alias("wavg_price")
    )


B27_SQL = """
SELECT l_returnflag,
  CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
    / CAST(SUM(CAST(l_quantity AS BIGINT)) * 100 AS DOUBLE) AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------------- B3 full outer
def b03_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """B3 — full outer join over two aggregates of disjoint-ish keys."""
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    o = orders.groupBy(F.col("o_orderkey").alias("k")).agg(F.count("*").alias("n_o"))
    l = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(F.count("*").alias("n_l"))
    return o.join(l, "k", "full").select(
        "k", F.coalesce("n_o", F.lit(0)).alias("n_o"), F.coalesce("n_l", F.lit(0)).alias("n_l")
    )


B03_FULL_SQL = """
SELECT coalesce(o.k, l.k) AS k, coalesce(n_o, 0) AS n_o, coalesce(n_l, 0) AS n_l
FROM (SELECT o_orderkey AS k, count(*) AS n_o FROM orders GROUP BY 1) o
FULL OUTER JOIN (SELECT l_orderkey AS k, count(*) AS n_l FROM lineitem GROUP BY 1) l
  ON o.k = l.k
"""


# ------------------------------------------------------- grouping sets
def b10_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """B10 — explicit GROUPING SETS (via SQL — the DataFrame API only
    exposes rollup/cube) + grouping_id disambiguation."""
    load_table(spark, sf, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS c,
               grouping(o_orderpriority) AS g_pri, grouping(o_orderstatus) AS g_st
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


B10_GS_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS c,
       grouping(o_orderpriority) AS g_pri, grouping(o_orderstatus) AS g_st
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


# ------------------------------------------------------- first/last frame
def b12_first_last(spark: SparkSession, sf: str) -> DataFrame:
    """B12 — first/last_value over explicit row frames."""
    orders = load_table(spark, sf, "orders")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w_full).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


B12_FL_SQL = """
SELECT o_custkey, o_orderkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice)  OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


PROBES = [
    Probe("b25_pandas_udf", "B25", b25_pandas_udf, B25_SQL),
    Probe("b26_udtf_split", "B26", b26_udtf_split, B26_SQL),
    Probe("b27_grouped_agg_udaf", "B27", b27_grouped_agg_udaf, B27_SQL),
    Probe("b03_full_outer", "B3", b03_full_outer, B03_FULL_SQL),
    Probe("b10_grouping_sets", "B10", b10_grouping_sets, B10_GS_SQL),
    Probe("b12_first_last", "B12", b12_first_last, B12_FL_SQL),
]


# ------------------------------------------- B25 grouped-map variant
def b25_applyinpandas(spark: SparkSession, sf: str) -> DataFrame:
    """B25 (grouped map) — per-group min-max scaling via applyInPandas:
    each group arrives as one pandas frame (Arrow). Same IEEE ops as
    the SQL window twin: (v - min) / (max - min) on identical doubles."""
    events = load_table(spark, sf, "events")

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["value"].min(), pdf["value"].max()
        rng = hi - lo
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "scaled": (pdf["value"] - lo) / rng if rng else 0.0,
            }
        )
        return out

    return events.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        scale, "event_id long, event_type string, scaled double"
    )


B25_AIP_SQL = """
SELECT event_id, event_type,
  (value - min(value) OVER w) / (max(value) OVER w - min(value) OVER w) AS scaled
FROM events
WINDOW w AS (PARTITION BY event_type)
"""

PROBES.append(Probe("b25_applyinpandas", "B25", b25_applyinpandas, B25_AIP_SQL))


# ------------------------------------------------ B26: real Python UDTF
def b26_python_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """B26 modern tier — an actual Python UDTF (Spark 4 ``@udtf``
    class) invoked through SQL LATERAL, vs b26_udtf_split's
    posexplode formulation: one eval call per input row fanning out to
    (pos, word) rows executor-side. Bounded to the first 5 tokens per
    document so the probe output stays O(docs). The oracle replicates
    the fan-out with generate_series indexing."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, word: string")
    class HeadTokens:
        def eval(self, text: str):
            toks = (text or "").strip().split()
            for i, w in enumerate(toks[:5]):
                yield (i, w)

    spark.udtf.register("head_tokens", HeadTokens)
    load_table(spark, sf, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.word
        FROM _docs_udtf d, LATERAL head_tokens(d.text) s
        """
    )


B26_PYUDTF_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
           FROM documents)
SELECT doc_id, i - 1 AS pos, w[i] AS word
FROM t CROSS JOIN unnest(generate_series(1, least(len(w), 5))) AS g(i)
"""

PROBES.append(Probe("b26_python_udtf", "B26", b26_python_udtf, B26_PYUDTF_SQL))
