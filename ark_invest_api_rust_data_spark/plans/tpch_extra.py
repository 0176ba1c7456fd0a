"""TPC-H breadth probes (adapted): Q2, Q7-Q15, Q17-Q22.

The driver testdata (TESTDATA.md) has no ``partsupp`` table and lacks a
few TPC-H columns (l_shipmode, l_commitdate, p_container), so each
query keeps its *shape* — the join topology, subquery nesting, and
aggregation pattern that exercises the optimizer — with filters adapted
to the columns that exist. ``lineitem`` doubles as the supply relation
where partsupp is needed (Q2, Q11, Q20); "late" is modeled as
``l_shipdate > o_orderdate + 60 days`` (Q12, Q21).

Shapes exercised (beyond the b01-b24 probes):
- Q2   correlated min over a 5-table join (min-cost supplier)
- Q7   two-sided nation-pair join with a disjunctive pair predicate
- Q8   market share: conditional-sum ratio over a star join by year
- Q9   profit expression across part/supplier dims by nation × year
- Q10  top-k customers by returned-item revenue (TakeOrderedAndProject)
- Q11  scalar aggregate subquery in HAVING (important stock)
- Q12  conditional counting after a date-arithmetic join filter
- Q13  left outer join with ON-clause filter → distribution of counts
- Q14  ratio of conditional to total aggregate (promo revenue)
- Q15  equality with an aggregate-of-aggregate scalar (top supplier)
- Q17  per-group average correlated threshold (small-quantity parts)
- Q18  IN over a HAVING subquery (large-volume orders)
- Q19  disjunction of conjunctive range predicates (pushdown stress)
- Q20  nested IN subqueries with grouped HAVING (part suppliers)
- Q21  EXISTS + NOT EXISTS self-joins (waiting supplier)
- Q22  NOT EXISTS + scalar average subquery (global sales opportunity)

Float determinism: the decimal-sum-cast-double policy from
relational.py applies to every aggregate; ratios divide two such
doubles with identically-ordered operations on both sides.

At 100 TB: every query here is one or two fact shuffles plus broadcast
dims under AQE; the self-join-heavy shapes (Q21) reuse the lineitem
shuffle partitioning on l_orderkey; the correlated shapes are expressed
as join+groupBy (no per-row subquery execution) so Catalyst plans them
as a single DAG — the same de-correlation a warehouse optimizer does.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from .base import Probe


def _dec(c: str, p: int = 12, s: int = 2):
    return F.col(c).cast(f"decimal({p},{s})")


def _revenue():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 4, 2)
    )


def _dsum(expr, alias: str):
    return F.sum(expr).cast("double").alias(alias)


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _ts(d: str):
    return F.lit(d).cast("timestamp_ntz")


# ---------------------------------------------------------------- Q2
def q02_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape: for each size-15 LARGE part, the EUROPE supplier(s) with
    the minimum account balance among those who shipped it. The
    correlated ``= (SELECT min(..))`` is de-correlated into
    groupBy+join — one aggregation, no per-row subquery."""
    part = load_table(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    lineitem = load_table(spark, sf, "lineitem")

    supply = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    min_bal = supply.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        supply.join(min_bal, "l_partkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )


Q02_SQL = """
WITH supply AS (
  SELECT DISTINCT l_partkey, s_suppkey, s_name, s_acctbal, n_name
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name
FROM supply
JOIN part ON l_partkey = p_partkey
WHERE p_size = 15 AND p_type = 'LARGE'
  AND s_acctbal = (SELECT min(s2.s_acctbal) FROM supply s2
                   WHERE s2.l_partkey = supply.l_partkey)
"""


# ---------------------------------------------------------------- Q7
def q07_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 shape: shipping volume between two nations by year, the
    disjunctive pair predicate ``(n1,n2) OR (n2,n1)`` applied after a
    two-sided nation join (supplier nation × customer nation)."""
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(_revenue(), "revenue"))
    )


Q07_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, {_REV_SQL} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------- Q8
def q08_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 shape: NATION_8 suppliers' share of ASIA customers' purchase
    volume by year — conditional-sum / total-sum ratio. Numerator and
    denominator are exact decimal sums cast to double; the division is
    the only inexact op and both engines divide the same two doubles."""
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    nation_c = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    nation_s = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    vol = _revenue()
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_8", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


Q08_SQL = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_8' THEN volume
                     ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year, {_REV_SQL} AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = 'ASIA'
) all_nations
GROUP BY o_year
"""


# ---------------------------------------------------------------- Q9
def q09_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape: profit by supplier nation × year over parts matching a
    name pattern. Cost uses p_retailprice (no partsupp in testdata);
    the profit expression mixes two decimal products under one sum."""
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supplier = load_table(spark, sf, "supplier")
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
    nation = load_table(spark, sf, "nation")
    profit = _revenue() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_dsum(profit, "sum_profit"))
    )


Q09_SQL = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM({_REV_SQL}
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------- Q10
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 shape: top 20 customers by revenue lost to returns in one
    quarter — star join then TakeOrderedAndProject with a deterministic
    c_custkey tiebreak."""
    lineitem = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_revenue(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------- Q11
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape: parts whose shipped value exceeds a fraction of the
    global total — scalar aggregate subquery in HAVING, expressed as a
    broadcast cross-join of the 1-row global aggregate (decimal-exact
    comparison, no double equality)."""
    lineitem = load_table(spark, sf, "lineitem")
    value = _dec("l_extendedprice") * _dec("l_quantity")
    per_part = lineitem.groupBy("l_partkey").agg(F.sum(value).alias("_val_dec"))
    total = per_part.agg(
        F.sum("_val_dec").alias("_total_dec")
    )  # 1 row — broadcast cross join
    frac = F.lit("0.0006").cast("decimal(10,6)")
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_val_dec") > F.col("_total_dec") * frac)
        .select(
            "l_partkey", F.col("_val_dec").cast("double").alias("part_value")
        )
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS val_dec
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM per_part
WHERE val_dec > (SELECT SUM(val_dec) FROM per_part)
                * CAST(0.0006 AS DECIMAL(10,6))
"""


# ---------------------------------------------------------------- Q12
def q12_late_shipment_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shape: conditional priority counting over a date-arithmetic
    join filter ("late" = shipped >60 days after order) grouped by
    return flag (testdata has no l_shipmode)."""
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------- Q13
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts — left outer
    join with the filter in the ON clause (not WHERE: customers with no
    qualifying orders must survive with count 0), then a second
    aggregation over the first."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# ---------------------------------------------------------------- Q14
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 shape: promo revenue percentage in one month — conditional
    aggregate over total aggregate, both decimal-exact before the one
    double division (multiplied by 100.0 on both sides identically)."""
    lineitem = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    part = load_table(spark, sf, "part")
    vol = _revenue()
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
       / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


# ---------------------------------------------------------------- Q15
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: supplier(s) with the maximum quarterly revenue —
    aggregate-of-aggregate scalar compared for equality. The comparison
    stays in exact decimal (cast to double only for output) so the
    max-equality join cannot be broken by float rounding."""
    lineitem = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supplier = load_table(spark, sf, "supplier")
    rev = lineitem.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("_rev_dec"))
    max_rev = rev.agg(F.max("_rev_dec").alias("_max_dec"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("_rev_dec") == F.col("_max_dec"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev_dec").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
"""


# ---------------------------------------------------------------- Q17
def q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 shape: revenue from orders of less than half the part's
    average quantity, one brand — the correlated AVG de-correlates into
    a per-part aggregate joined back to the fact (AQE broadcasts the
    2k-row aggregate side)."""
    lineitem = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#12")
    avg_qty = lineitem.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("_avg_qty")
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("_avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < 0.5 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------- Q18
def q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 shape: customers behind orders totaling >200 units — IN over
    a grouped-HAVING subquery, expressed as a semi-join; the qualifying
    order set re-aggregates with customer attached."""
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    big = (
        lineitem.groupBy(F.col("l_orderkey").alias("_ok"))
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > F.lit(200).cast("decimal(12,2)"))
        .select("_ok")
    )
    return (
        lineitem.join(big, F.col("l_orderkey") == F.col("_ok"), "leftsemi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(200 AS DECIMAL(12,2)))
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


# ---------------------------------------------------------------- Q19
def q19_disjunctive_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: revenue under a disjunction of conjunctive brand ×
    size × quantity range groups — the OR-of-ANDs that stresses
    predicate pushdown and join-condition extraction (Catalyst factors
    the common l_partkey=p_partkey out of the disjunction)."""
    lineitem = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    g1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    g2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    g3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(g1 | g2 | g3)
        .agg(_dsum(_revenue(), "revenue"))
    )


Q19_SQL = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------- Q20
def q20_part_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape: suppliers who shipped >50 units of some red part —
    nested IN subqueries (part-filter inside supply-filter inside the
    supplier semi-join), each level a semi-join in the DataFrame plan."""
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    lineitem = load_table(spark, sf, "lineitem")
    red_parts = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select(F.col("p_partkey").alias("_rpk"))
    )
    heavy_supp = (
        lineitem.join(
            F.broadcast(red_parts), F.col("l_partkey") == F.col("_rpk"), "leftsemi"
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > F.lit(50).cast("decimal(12,2)"))
        .select(F.col("l_suppkey").alias("_hs"))
        .distinct()
    )
    return (
        supplier.join(heavy_supp, F.col("s_suppkey") == F.col("_hs"), "leftsemi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(50 AS DECIMAL(12,2)))
"""


# ---------------------------------------------------------------- Q21
def q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: suppliers who were the *only* late shipper on a
    multi-supplier completed order — EXISTS (another supplier on the
    order) + NOT EXISTS (another *late* supplier), as leftsemi/leftanti
    self-joins that reuse the l_orderkey shuffle partitioning. Top 10
    with name tiebreak."""
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_5")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    l1 = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    others = lineitem.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    late_others = l1.select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    waiting = l1.join(
        others,
        (F.col("l_orderkey") == F.col("_ok2")) & (F.col("l_suppkey") != F.col("_sk2")),
        "leftsemi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("_ok3")) & (F.col("l_suppkey") != F.col("_sk3")),
        "leftanti",
    )
    return (
        waiting.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND o3.o_orderstatus = 'F'
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


# ---------------------------------------------------------------- Q22
def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: well-funded customers with no high-value urgent order,
    bucketed by a name-derived code — NOT EXISTS (leftanti) plus a
    scalar average subquery (broadcast cross join of the 1-row
    positive-balance average; the > comparison uses the same double on
    both sides). Code digit is position 18 (the low-order digit of the
    customer number — earlier positions are all leading zeros at test
    scales); the anti-join side is filtered, keeping both branches
    non-trivial."""
    customer = load_table(spark, sf, "customer")
    orders = (
        load_table(spark, sf, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 400000)
        )
        .select(F.col("o_custkey").alias("_oc"))
    )
    code = F.substring(F.col("c_name"), 18, 1)
    cust = customer.filter(code.isin("1", "3", "5", "7"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("_oc"), "leftanti")
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT substring(c_name, 18, 1) AS cntrycode, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE substring(c_name, 18, 1) IN ('1','3','5','7')
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*)
    FROM customer c2
    WHERE c2.c_acctbal > 0.0
      AND substring(c2.c_name, 18, 1) IN ('1','3','5','7'))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT'
                    AND o_totalprice > 400000)
GROUP BY substring(c_name, 18, 1)
"""


PROBES = [
    Probe("tpch_q02_min_cost_supplier", "B4", q02_min_cost_supplier, Q02_SQL),
    Probe("tpch_q07_volume_shipping", "B2", q07_volume_shipping, Q07_SQL),
    Probe("tpch_q08_market_share", "B2", q08_market_share, Q08_SQL),
    Probe("tpch_q09_product_profit", "B2", q09_product_profit, Q09_SQL),
    Probe("tpch_q10_returned_items", "B13", q10_returned_items, Q10_SQL),
    Probe("tpch_q11_important_stock", "B4", q11_important_stock, Q11_SQL),
    Probe("tpch_q12_late_priority", "B7", q12_late_shipment_priority, Q12_SQL),
    Probe("tpch_q13_cust_distribution", "B3", q13_customer_distribution, Q13_SQL),
    Probe("tpch_q14_promo_revenue", "B7", q14_promo_revenue, Q14_SQL),
    Probe("tpch_q15_top_supplier", "B4", q15_top_supplier, Q15_SQL),
    Probe("tpch_q17_small_quantity", "B4", q17_small_quantity, Q17_SQL),
    Probe("tpch_q18_large_volume", "B4", q18_large_volume_customer, Q18_SQL),
    Probe("tpch_q19_disjunctive", "B7", q19_disjunctive_pushdown, Q19_SQL),
    Probe("tpch_q20_part_suppliers", "B4", q20_part_suppliers, Q20_SQL),
    Probe("tpch_q21_waiting_supplier", "B4", q21_waiting_supplier, Q21_SQL),
    Probe("tpch_q22_global_sales", "B4", q22_global_sales_opportunity, Q22_SQL),
]
