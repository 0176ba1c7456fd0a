"""Relational query surface (SURVEY.md §2 Part B, B1–B22).

Each probe is idiomatic DataFrame API — joins declared with broadcast
hints for dimension tables, aggregations left to Catalyst's
partial/final hash aggregation, windows via pyspark Window — paired
with an ANSI-SQL DuckDB oracle.

Float determinism policy: every SUM/AVG over money/quantity columns is
computed in exact DECIMAL arithmetic (inputs are exactly 2dp, verified)
and cast to double at the end, on BOTH sides. Decimal +/* are exact, so
Spark and DuckDB produce bit-identical doubles regardless of
row/partition order. AVG is computed as exact-decimal-sum cast to
double divided by count (same operands → same IEEE division result).
Irrational math (sqrt) is IEEE-correctly-rounded, hence deterministic;
we avoid log/exp in hashed outputs.

At 100 TB: the star joins broadcast dims (region/nation/supplier always;
part/customer under AQE size estimates), fact-fact joins shuffle on the
join key with AQE skew handling; aggregations are partial+final (map-side
combine) automatically. No driver-side loops anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..operators.asof import asof_join
from .base import Probe


def _dec(c: str, p: int = 12, s: int = 2):
    return F.col(c).cast(f"decimal({p},{s})")


def _dsum(expr, alias: str):
    return F.sum(expr).cast("double").alias(alias)


# ---------------------------------------------------------------- B1
def b01_join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join, broadcast dim (SURVEY B1)."""
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("c"))
    )


B01_SQL = """
SELECT n_name, count(*) AS c
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------- B2
def b02_star_join(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way star join (SURVEY B2): revenue by nation
    for one region and one year. lineitem⋈orders shuffles on orderkey;
    all dims broadcast."""
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 4, 2))
    year_1997 = (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")) & (
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )  # range form (≡ year()=1997) so the predicate pushes into the scan
    return (
        lineitem.join(
            orders.filter(year_1997), F.col("l_orderkey") == F.col("o_orderkey")
        )
        # customer/supplier are unbounded (grow with SF): no hard
        # broadcast hint — AQE picks broadcast vs shuffle from its
        # runtime size estimate. Hints stay only on fixed-size dims
        # (nation=25, region=5 rows at every SF).
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation),
            (F.col("c_nationkey") == F.col("n_nationkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(_dsum(revenue, "revenue"))
    )


B02_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
             AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------- B3
def b03_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join + count of non-null keys (SURVEY B3)."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


B03_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# ---------------------------------------------------------------- B4 semi
def b04_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (SURVEY B4): customers that do have orders."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


B04_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def b04_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join (SURVEY B4): customers with no orders."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey")


B04_ANTI_SQL = """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------- B5
def b05_theta_join(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-join with extra non-equi (theta) condition (SURVEY B5)."""
    part = load_table(spark, sf, "part")
    lineitem = load_table(spark, sf, "lineitem")
    return (
        # part is unbounded: let AQE decide broadcast vs shuffle.
        lineitem.join(
            part,
            (F.col("l_partkey") == F.col("p_partkey")) & (F.col("l_quantity") > F.col("p_size")),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("c"))
    )


B05_SQL = """
SELECT p_brand, count(*) AS c
FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
"""


# ---------------------------------------------------------------- B6
def b06_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (SURVEY B6): for each purchase event, the most recent
    click at-or-before it by the same user. Implemented with the
    union + last_value window composition (operators/asof.py) — one
    shuffle on user_id, no O(n²). DuckDB ASOF JOIN is the oracle."""
    events = load_table(spark, sf, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", values=["click_value"]
    )
    return joined.select("event_id", "user_id", "click_value")


B06_SQL = """
SELECT p.event_id, p.user_id, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------- B7
def b07_agg_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 pricing summary (SURVEY B7): partial+final hash agg."""
    lineitem = load_table(spark, sf, "lineitem")
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 4, 2)
    )
    charge = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 4, 2))
        * (F.lit(1).cast("decimal(12,2)") + _dec("l_tax", 4, 2))
    )
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_dec("l_quantity", 6, 2), "sum_qty"),
            _dsum(_dec("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (
                F.sum(_dec("l_quantity", 6, 2)).cast("double") / F.count("*")
            ).alias("avg_qty"),
            (
                F.sum(_dec("l_discount", 4, 2)).cast("double") / F.count("*")
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


B07_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))
           * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
      AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- B8
def b08_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct aggregation (SURVEY B8)."""
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


B08_SQL = """
SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------- B9
def b09_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Approx distinct (SURVEY B9). HLL estimates differ across engines,
    so the hashed output is the *tolerance verdict* (≤5% error vs exact)
    — true in both engines; the estimate itself is engine-local."""
    orders = load_table(spark, sf, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("_approx"),
        F.countDistinct("o_custkey").alias("n_exact"),
    ).select(
        "n_exact",
        (
            F.abs(F.col("_approx") - F.col("n_exact")) / F.col("n_exact") <= F.lit(0.05)
        ).alias("approx_ok"),
    )


B09_SQL = """
SELECT count(DISTINCT o_custkey) AS n_exact,
       abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
         / count(DISTINCT o_custkey) <= 0.05 AS approx_ok
FROM orders
"""


# ---------------------------------------------------------------- B10
def b10_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY B10)."""
    orders = load_table(spark, sf, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("c"))


B10_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS c
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def b10_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets (SURVEY B10)."""
    orders = load_table(spark, sf, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("c"))


B10_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS c
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------- B11
def b11_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking window (SURVEY B11): top-3 orders per customer, total
    tie-break on (o_totalprice desc, o_orderkey) for determinism."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


B11_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
"""


# ---------------------------------------------------------------- B12
def b12_window_running(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic window with frame (SURVEY B12): running revenue per
    customer; exact decimal running sum → order-insensitive doubles."""
    orders = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.lag("o_totalprice", 1).over(
            Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        ).alias("prev_price"),
    )


B12_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_spend,
  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders
"""


# ---------------------------------------------------------------- B13
def b13_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k (SURVEY B13): Spark plans TakeOrderedAndProject —
    per-partition heap + driver merge, no full sort at scale."""
    orders = load_table(spark, sf, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.to_date("o_orderdate").alias("o_date"),
        )
    )


B13_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------- B14
def b14_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Set ops (SURVEY B14): INTERSECT."""
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    return orders.select(F.col("o_custkey").alias("k")).intersect(
        customer.select(F.col("c_custkey").alias("k"))
    )


B14_SQL = """
SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey AS k FROM customer
"""


def b14_except(spark: SparkSession, sf: str) -> DataFrame:
    """Set ops (SURVEY B14): EXCEPT (distinct semantics both engines)."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return customer.select(F.col("c_custkey").alias("k")).exceptAll(
        orders.select(F.col("o_custkey").alias("k")).distinct()
    )


B14_EXCEPT_SQL = """
SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders
"""


# ---------------------------------------------------------------- B15
def b15_string_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar string functions (SURVEY B15): the C6/C7-style cleanup
    chain vocabulary — upper/substring/trim/regexp/split/concat/length."""
    part = load_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("uname"),
        F.length(F.col("p_name")).alias("nlen"),
        F.substring(F.col("p_name"), 1, 5).alias("prefix5"),
        F.trim(F.regexp_replace(F.col("p_name"), "part", "")).alias("noword"),
        F.regexp_extract(F.col("p_name"), "([0-9]+)", 1).alias("num"),
        F.size(F.split(F.col("p_name"), " ")).alias("ntok"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
    )


B15_SQL = """
SELECT p_partkey,
  upper(p_name) AS uname,
  length(p_name) AS nlen,
  substring(p_name, 1, 5) AS prefix5,
  trim(regexp_replace(p_name, 'part', '', 'g')) AS noword,
  coalesce(regexp_extract(p_name, '([0-9]+)', 1), '') AS num,
  len(string_split(p_name, ' ')) AS ntok,
  concat_ws('|', p_brand, p_type) AS brand_type
FROM part
"""


# ---------------------------------------------------------------- B16
def b16_date_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time functions (SURVEY B16)."""
    orders = load_table(spark, sf, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.to_date(F.date_trunc("quarter", F.col("o_orderdate"))).alias("q_start"),
            F.datediff(
                F.to_date(F.col("o_orderdate")), F.lit("1995-01-01").cast("date")
            ).alias("days_since"),
        )
        .groupBy("y", "m", "q_start")
        .agg(F.count("*").alias("c"), F.max("days_since").alias("max_days"))
    )


B16_SQL = """
SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
       count(*) AS c,
       max(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS max_days
FROM orders GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------- B17
def b17_math_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Math functions (SURVEY B17): round/floor/ceil/abs/pow/sqrt.
    sqrt is IEEE correctly-rounded → cross-engine deterministic;
    pow with small integer exponent on int input is exact."""
    part = load_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.round(F.col("p_retailprice"), 1).alias("price_r1"),
        F.floor(F.col("p_retailprice")).cast("long").alias("price_floor"),
        F.ceil(F.col("p_retailprice")).cast("long").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.pow(F.col("p_size").cast("double"), F.lit(2.0)).alias("size_sq"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
    )


B17_SQL = """
SELECT p_partkey,
  round(p_retailprice, 1) AS price_r1,
  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
  abs(p_size - 25) AS size_dev,
  pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
  sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt
FROM part
"""


# ---------------------------------------------------------------- B18
def b18_array_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Array + higher-order functions (SURVEY B18) over embeddings.
    L2 norm² on a μ-quantized integer grid: floor(x·1e6) is exact and
    identical in every engine (float→double is exact, IEEE multiply is
    correctly rounded, floor is exact), so the fold is pure int64 math
    — no float-reduction-order or decimal-cast divergence possible."""
    emb = load_table(spark, sf, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    norm2q = F.aggregate(
        F.transform(q, lambda v: v * v),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        "label",
        F.size(F.col("embedding")).alias("dim"),
        F.element_at(F.col("embedding"), 1).cast("double").alias("first_val"),
        norm2q.alias("norm2_q"),
    )


B18_SQL = """
SELECT vec_id, label,
  len(embedding) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_val,
  CAST(list_sum(list_transform(embedding,
        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
             * CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)))
       AS BIGINT) AS norm2_q
FROM embeddings
"""


# ---------------------------------------------------------------- B19
def b19_json_fns(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction (SURVEY B19) over events.props."""
    events = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .withColumn("k_bucket", (F.col("k") % 10))
        .groupBy("event_type", "k_bucket")
        .agg(F.count("*").alias("c"))
    )


B19_SQL = """
SELECT event_type, CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket, count(*) AS c
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------- B20
def b20_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional / null functions (SURVEY B20)."""
    customer = load_table(spark, sf, "customer")
    return (
        customer.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("bal_band"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
                "seg"
            ),
        )
        .groupBy("bal_band", "seg")
        .agg(F.count("*").alias("c"))
    )


B20_SQL = """
SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
       count(*) AS c
FROM customer GROUP BY 1, 2
"""


# ------------------------------------------------------- B21 (batch twin)
def b21_window_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 10-minute event-time window (SURVEY B21), batch twin of
    the streaming query (streaming/windows.py runs the same plan with
    readStream+watermark; tests assert batch == streaming replay)."""
    events = load_table(spark, sf, "events")
    win = F.window(F.col("ts"), "10 minutes")
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("c"), _dsum(_dec("value", 10, 2), "sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "c",
            "sum_value",
        )
    )


B21_SQL = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
       count(*) AS c,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------------- B22 (batch twin)
def b22_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows, batch formulation (SURVEY B22): gaps-and-islands
    with a 30-minute inactivity gap; one shuffle on user_id."""
    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        events.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
    )


B22_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) > 1800
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events),
sessions AS (
  SELECT user_id,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked),
per_sess AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessions GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
FROM per_sess GROUP BY user_id
"""


PROBES = [
    Probe("b01_join_broadcast", "B1", b01_join_broadcast, B01_SQL),
    Probe("b02_star_join", "B2", b02_star_join, B02_SQL),
    Probe("b03_outer_join", "B3", b03_outer_join, B03_SQL),
    Probe("b04_semi_join", "B4", b04_semi_join, B04_SEMI_SQL),
    Probe("b04_anti_join", "B4", b04_anti_join, B04_ANTI_SQL),
    Probe("b05_theta_join", "B5", b05_theta_join, B05_SQL),
    Probe("b06_asof_join", "B6", b06_asof_join, B06_SQL),
    Probe("b07_agg_q1", "B7", b07_agg_q1, B07_SQL),
    Probe("b08_distinct_agg", "B8", b08_distinct_agg, B08_SQL),
    Probe("b09_approx_distinct", "B9", b09_approx_distinct, B09_SQL),
    Probe("b10_rollup", "B10", b10_rollup, B10_SQL),
    Probe("b10_cube", "B10", b10_cube, B10_CUBE_SQL),
    Probe("b11_window_rank", "B11", b11_window_rank, B11_SQL),
    Probe("b12_window_running", "B12", b12_window_running, B12_SQL),
    Probe("b13_topk", "B13", b13_topk, B13_SQL),
    Probe("b14_intersect", "B14", b14_intersect, B14_SQL),
    Probe("b14_except", "B14", b14_except, B14_EXCEPT_SQL),
    Probe("b15_string_fns", "B15", b15_string_fns, B15_SQL),
    Probe("b16_date_fns", "B16", b16_date_fns, B16_SQL),
    Probe("b17_math_fns", "B17", b17_math_fns, B17_SQL),
    Probe("b18_array_fns", "B18", b18_array_fns, B18_SQL),
    Probe("b19_json_fns", "B19", b19_json_fns, B19_SQL),
    Probe("b20_conditional", "B20", b20_conditional, B20_SQL),
    Probe("b21_window_tumbling", "B21", b21_window_tumbling, B21_SQL),
    Probe("b22_sessionize", "B22", b22_sessionize, B22_SQL),
]


# ------------------------------------------------------- B21 sliding
def b21_window_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 10-min/5-min window, batch twin (SURVEY B21): each event
    lands in exactly two windows; oracle enumerates both via the two
    5-minute-aligned starts."""
    events = load_table(spark, sf, "events")
    win = F.window(F.col("ts"), "10 minutes", "5 minutes")
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("c"))
        .select(F.col("w.start").alias("w_start"), "event_type", "c")
    )


B21_SLIDING_SQL = """
WITH starts AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS w_start FROM events
  UNION ALL
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
  FROM events)
SELECT w_start, event_type, count(*) AS c FROM starts GROUP BY 1, 2
"""


# ------------------------------------------------------- B8 percentile
def b08_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-set aggregate (SURVEY B8 family): exact discrete
    percentiles — percentile_disc picks an actual row value, so there
    is no interpolation formula to disagree on across engines.

    Scale note: the BUILT-IN exact percentile concentrates each
    group's full value set on one reducer (the 2.7 MB shuffle at sf0.1
    is every o_totalprice) — kept as the reference form. The scale
    tiers are ``b08_percentile_hist`` (round 4: same EXACT result via
    a value histogram, shuffle O(distinct values), window bounded by
    the value domain — the r2/r3 straggler weak flag cleared) and
    ``approx_percentile`` (t-digest sketch) when approximation is
    acceptable."""
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").alias("p90"),
    )


B08_PCT_SQL = """
SELECT o_orderstatus,
  quantile_disc(o_totalprice, 0.5) AS p50,
  quantile_disc(o_totalprice, 0.9) AS p90
FROM orders GROUP BY o_orderstatus
"""

def b08_percentile_hist(spark: SparkSession, sf: str) -> DataFrame:
    """B8 — the SCALE-SAFE exact-percentile tier (round 4, clearing the
    r2/r3 weak flag): identical result to b08_percentile through a
    value histogram — shuffle O(distinct values) with map-side combine,
    window partitions bounded by the value domain instead of the group
    row count (operators/percentile.py has the plan argument). Shares
    b08's oracle: exactness is the whole point."""
    from ..operators.percentile import exact_percentile_hist

    orders = load_table(spark, sf, "orders")
    return exact_percentile_hist(
        orders, ["o_orderstatus"], "o_totalprice", {"p50": 0.5, "p90": 0.9}
    )


PROBES.extend(
    [
        Probe("b21_window_sliding", "B21", b21_window_sliding, B21_SLIDING_SQL),
        Probe("b08_percentile", "B8", b08_percentile, B08_PCT_SQL),
        Probe("b08_percentile_hist", "B8", b08_percentile_hist, B08_PCT_SQL),
    ]
)


# ------------------------------------------------------- TPC-H Q3 shape
def b02_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Q3 shape (SURVEY B2): top-10 unshipped orders by revenue for one
    market segment — join + agg + top-k in one plan."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    cutoff = F.lit("1997-03-15").cast("timestamp_ntz")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 4, 2))
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        # filtered customer is still SF-proportional: no hard hint, AQE decides.
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_date"))
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


B02_Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
    AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
WHERE l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# ---------------------------------------------- scalar subquery (Q18ish)
def b04_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar + HAVING-style subqueries (SURVEY B4 family): customers
    whose total spend exceeds 1.5× the average customer spend."""
    load_table(spark, sf, "orders").createOrReplaceTempView("_orders_sq")
    return spark.sql(
        """
        WITH spend AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
          FROM _orders_sq GROUP BY o_custkey)
        SELECT o_custkey, total FROM spend
        WHERE total > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                                         AS DOUBLE) / count(DISTINCT o_custkey)
                             FROM _orders_sq)
        """
    )


B04_SCALAR_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, total FROM spend
WHERE total > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                            / count(DISTINCT o_custkey)
                     FROM orders)
"""


# -------------------------------------------------------------- pivot
def b10_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT (SURVEY B10 family): order counts per priority, one column
    per status; oracle is conditional aggregation."""
    orders = load_table(spark, sf, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside pivot
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .fillna(0, subset=["n_f", "n_o", "n_p"])
    )


B10_PIVOT_SQL = """
SELECT o_orderpriority,
  count(*) FILTER (o_orderstatus = 'F') AS n_f,
  count(*) FILTER (o_orderstatus = 'O') AS n_o,
  count(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


# ------------------------------------------------- ranking fns complete
def b11_ranking_fns(spark: SparkSession, sf: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank/cume_dist (SURVEY B11) with a
    total tie-break order."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderstatus",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    ).filter(F.col("rnk") <= 20)


B11_RANKING_SQL = """
SELECT o_orderstatus, o_orderkey, rnk, drnk, quartile, prnk, cdist FROM (
  SELECT o_orderstatus, o_orderkey,
    rank()         OVER w AS rnk,
    dense_rank()   OVER w AS drnk,
    ntile(4)       OVER w AS quartile,
    percent_rank() OVER w AS prnk,
    cume_dist()    OVER w AS cdist
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey))
WHERE rnk <= 20
"""

PROBES.extend(
    [
        Probe("b02_q3_shipping_priority", "B2", b02_q3_shipping_priority, B02_Q3_SQL),
        Probe("b04_scalar_subquery", "B4", b04_scalar_subquery, B04_SCALAR_SQL),
        Probe("b10_pivot", "B10", b10_pivot, B10_PIVOT_SQL),
        Probe("b11_ranking_fns", "B11", b11_ranking_fns, B11_RANKING_SQL),
    ]
)


# ------------------------------------------------------- TPC-H Q4 shape
def b04_exists_q4(spark: SparkSession, sf: str) -> DataFrame:
    """Q4 shape (SURVEY B4): orders in one quarter having at least one
    line shipped after a cutoff — correlated EXISTS decorrelated by
    Catalyst into a semi join."""
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    q = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    joined = q.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


B04_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


# ------------------------------------------------------- TPC-H Q6 shape
def b07_forecast_q6(spark: SparkSession, sf: str) -> DataFrame:
    """Q6 shape (SURVEY B7): pure scan-filter-agg — revenue change from
    discounted small-quantity lines in one year. All predicates push to
    the parquet scan."""
    lineitem = load_table(spark, sf, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(_dec("l_extendedprice") * _dec("l_discount", 4, 2), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


B07_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ------------------------------------------------------ TPC-H Q16 shape
def b08_supplier_cnt_q16(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 shape (SURVEY B8): distinct-count with an anti-join
    exclusion list (suppliers of small parts, excluding one brand)."""
    part = load_table(spark, sf, "part")
    lineitem = load_table(spark, sf, "lineitem")
    eligible = part.filter((F.col("p_size") <= 10) & (F.col("p_brand") != "BRAND_0"))
    return (
        # eligible parts are SF-proportional: AQE decides broadcast vs shuffle.
        lineitem.join(eligible, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


B08_Q16_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10 AND p_brand <> 'BRAND_0'
GROUP BY p_brand, p_type
"""

PROBES.extend(
    [
        Probe("b04_exists_q4", "B4", b04_exists_q4, B04_Q4_SQL),
        Probe("b07_forecast_q6", "B7", b07_forecast_q6, B07_Q6_SQL),
        Probe("b08_supplier_cnt_q16", "B8", b08_supplier_cnt_q16, B08_Q16_SQL),
    ]
)


# ------------------------------------------- correlated scalar subquery
def b04_correlated_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (SURVEY B4 family) — Catalyst
    decorrelates it into an aggregate + left join."""
    load_table(spark, sf, "customer").createOrReplaceTempView("_cust_cs")
    load_table(spark, sf, "orders").createOrReplaceTempView("_orders_cs")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT CAST(min(o_orderdate) AS DATE) FROM _orders_cs
                WHERE o_custkey = c_custkey) AS first_order,
               (SELECT count(*) FROM _orders_cs
                WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS n_finished
        FROM _cust_cs
        """
    )


B04_CORR_SQL = """
SELECT c_custkey,
       (SELECT CAST(min(o_orderdate) AS DATE) FROM orders
        WHERE o_custkey = c_custkey) AS first_order,
       (SELECT count(*) FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS n_finished
FROM customer
"""

PROBES.append(Probe("b04_correlated_scalar", "B4", b04_correlated_scalar, B04_CORR_SQL))


# ------------------------------------------------- B23 (deterministic twin)
def b23_late_data_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark accept/drop semantics (SURVEY B23), batch-expressible
    deterministic replay twin of tests/test_streaming.py::
    test_b23_watermark_late_data_semantics.

    Models Structured Streaming's rule — watermark after each
    micro-batch is max(event time seen so far) − delay; an event is
    DROPPED iff its time is below the watermark established by PRIOR
    batches. Arrival order is a deterministic arithmetic shuffle
    ((event_id * 48271) % 10007, tie-broken by event_id; events arrive
    near-ordered by event_id, so a shuffle is needed to create genuine
    lateness), chunked into 500-row micro-batches.

    The global row_number models the SOURCE's arrival order — in a real
    stream that order is given, not computed; per-batch max + the
    running max over the (tiny) batch table are map-side combines plus
    a broadcast join back, which is the 100 TB shape."""
    events = load_table(spark, sf, "events").select("event_id", "ts", "event_type")
    arr = events.withColumn(
        "akey", (F.col("event_id") * F.lit(48271)) % F.lit(10007)
    )
    w_arr = Window.orderBy("akey", "event_id")
    batched = arr.withColumn(
        "batch", F.floor((F.row_number().over(w_arr) - F.lit(1)) / F.lit(500)).cast("long")
    )
    bmax = batched.groupBy("batch").agg(F.max("ts").alias("batch_max"))
    w_b = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -1)
    wm = bmax.withColumn("wm_max", F.max("batch_max").over(w_b)).select("batch", "wm_max")
    status = F.when(
        F.col("wm_max").isNull()
        | (F.col("ts") >= F.col("wm_max") - F.expr("INTERVAL 240 HOURS")),
        F.lit("accepted"),
    ).otherwise(F.lit("dropped"))
    return (
        batched.join(F.broadcast(wm), "batch")
        .withColumn("status", status)
        .groupBy("status", "event_type")
        .agg(F.count("*").alias("c"))
    )


B23_SQL = """
WITH arr AS (
  SELECT event_id, ts, event_type,
         (event_id * 48271) % 10007 AS akey
  FROM events),
rn AS (
  SELECT event_id, ts, event_type,
         row_number() OVER (ORDER BY akey, event_id) - 1 AS rid
  FROM arr),
batched AS (
  SELECT event_id, ts, event_type, rid // 500 AS batch FROM rn),
bmax AS (
  SELECT batch, max(ts) AS batch_max FROM batched GROUP BY batch),
wm AS (
  SELECT batch,
         max(batch_max) OVER (ORDER BY batch
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_max
  FROM bmax)
SELECT CASE WHEN w.wm_max IS NULL
            OR b.ts >= w.wm_max - INTERVAL '240 hours'
       THEN 'accepted' ELSE 'dropped' END AS status,
       b.event_type, count(*) AS c
FROM batched b JOIN wm w USING (batch)
GROUP BY status, b.event_type
"""

PROBES.append(Probe("b23_late_data_accounting", "B23", b23_late_data_accounting, B23_SQL))


# --------------------------------------- B23/B21 interval join (batch twin)
def b23_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join, batch twin (SURVEY B23 family):
    purchases ⋈ clicks of the same user within a 30-minute lookback —
    the exact plan streaming/windows.py interval_join runs under
    watermarks (replay equivalence: tests/test_streaming.py::
    test_stream_stream_interval_join_equals_batch)."""
    from ..streaming.windows import interval_join

    events = load_table(spark, sf, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", "ts"
    )
    return interval_join(purchases, clicks, "user_id").select("p_id", "c_id")


B23_INTERVAL_SQL = """
SELECT p.event_id AS p_id, c.event_id AS c_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL '30 minutes'
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

PROBES.append(Probe("b23_interval_join", "B23", b23_interval_join, B23_INTERVAL_SQL))


def b08_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """B8 scale tier — approx_percentile (mergeable sketch, O(sketch)
    shuffle instead of b08_percentile's per-group full-value
    concentration). Sketch estimates differ across engines, so as with
    B9 the hashed output is the tolerance verdict: the approx p50/p90
    must land within 2% of the exact percentile — checked per group in
    both engines; the estimate itself stays engine-local."""
    orders = load_table(spark, sf, "orders")
    exact = orders.groupBy("o_orderstatus").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("e50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").alias("e90"),
    )
    approx = orders.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("a90"),
    )
    tol = F.lit(0.02)
    return (
        exact.join(approx, "o_orderstatus")
        .select(
            "o_orderstatus",
            "e50",
            "e90",
            (F.abs(F.col("a50") - F.col("e50")) / F.col("e50") <= tol).alias("p50_ok"),
            (F.abs(F.col("a90") - F.col("e90")) / F.col("e90") <= tol).alias("p90_ok"),
        )
    )


B08_APPROX_SQL = """
WITH e AS (
  SELECT o_orderstatus,
    quantile_disc(o_totalprice, 0.5) AS e50,
    quantile_disc(o_totalprice, 0.9) AS e90
  FROM orders GROUP BY o_orderstatus),
a AS (
  SELECT o_orderstatus,
    approx_quantile(o_totalprice, 0.5) AS a50,
    approx_quantile(o_totalprice, 0.9) AS a90
  FROM orders GROUP BY o_orderstatus)
SELECT e.o_orderstatus, e50, e90,
  abs(a50 - e50) / e50 <= 0.02 AS p50_ok,
  abs(a90 - e90) / e90 <= 0.02 AS p90_ok
FROM e JOIN a ON e.o_orderstatus = a.o_orderstatus
"""

PROBES.append(
    Probe("b08_approx_percentile", "B8", b08_approx_percentile, B08_APPROX_SQL)
)


# ------------------------------------------------ B12: interval RANGE frames
def b12_range_interval(spark: SparkSession, sf: str) -> DataFrame:
    """B12 breadth — RANGE frames bounded by a TIME interval (trailing
    30-day order count + revenue per customer), distinct from the ROWS
    frames of b12_window_running: the frame is value-based, so peers
    enter/leave by timestamp distance, not row position. Interval RANGE
    bounds are SQL-only surface in Spark (DataFrame rangeBetween takes
    long offsets), so the probe goes through spark.sql — same Catalyst
    window operator underneath. The windowed SUM runs in DECIMAL so the
    varying frame association order cannot produce FP drift vs the
    oracle."""
    load_table(spark, sf, "orders").createOrReplaceTempView("_orders_ri")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_orderdate,
          count(*) OVER w AS n_30d,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
            AS rev_30d
        FROM _orders_ri
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        """
    )


B12_RANGE_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
  count(*) OVER w AS n_30d,
  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS rev_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
"""

PROBES.append(Probe("b12_range_interval", "B12", b12_range_interval, B12_RANGE_SQL))


# ------------------------------------------------ B19: Variant type
def b19_variant(spark: SparkSession, sf: str) -> DataFrame:
    """B19 modern tier — semi-structured data through Spark 4's VARIANT
    type: ``parse_json`` once into the binary variant encoding, then
    typed ``variant_get`` path extraction. At scale this is the
    materialize-once / extract-many pattern for JSON event payloads
    (variant decode is O(1) per path vs re-parsing the JSON string per
    extraction). The oracle extracts the same path with DuckDB's JSON
    operators — values must agree exactly."""
    events = load_table(spark, sf, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("c"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


B19_VARIANT_SQL = """
SELECT event_type, count(*) AS c,
       -- CAST the SUM itself: DuckDB widens SUM(BIGINT) to HUGEINT
       -- (int128), and the driver's value-hash is typing-sensitive even
       -- when the numeric values agree (CORRECTNESS_r02 b19_variant).
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
       MIN(CAST(props->>'$.k' AS BIGINT)) AS k_min,
       MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max
FROM events
WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
GROUP BY 1
"""

PROBES.append(Probe("b19_variant", "B19", b19_variant, B19_VARIANT_SQL))


# ------------------------------------------------ B14: EXCEPT ALL
def b14_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """B14 breadth — bag (multiplicity-preserving) set difference:
    EXCEPT ALL keeps surplus duplicate occurrences, unlike the set
    variant already covered. Probe: order priorities of urgent orders
    minus one occurrence per distinct priority appearing among
    5-URGENT... priorities from low-key customers."""
    orders = load_table(spark, sf, "orders")
    left = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderpriority"
    )
    right = orders.filter(F.col("o_custkey") % 100 == 0).select("o_orderpriority")
    return left.exceptAll(right).groupBy("o_orderpriority").agg(
        F.count("*").alias("c")
    )


B14_EXCEPT_ALL_SQL = """
SELECT o_orderpriority, count(*) AS c FROM (
  SELECT o_orderpriority FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_custkey % 100 = 0)
GROUP BY 1
"""

PROBES.append(Probe("b14_except_all", "B14", b14_except_all, B14_EXCEPT_ALL_SQL))


# ------------------------------------------------ B10: unpivot / melt
def b10_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """B10 breadth — unpivot (melt): lineitem's four value columns to
    (measure, value) rows, aggregated per measure. The inverse surface
    of the pivot probe; DECIMAL aggregation for cross-engine
    exactness."""
    lineitem = load_table(spark, sf, "lineitem")
    melted = lineitem.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return melted.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.sum(F.col("val").cast("decimal(18,4)")).cast("double").alias("total"),
    )


B10_UNPIVOT_SQL = """
SELECT measure, count(*) AS n,
       CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM (
  UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax
           FROM lineitem)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME measure VALUE val)
GROUP BY 1
"""

PROBES.append(Probe("b10_unpivot", "B10", b10_unpivot, B10_UNPIVOT_SQL))


# ------------------------------------------------ B15: edit distance
def b15_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    """B15 breadth — Levenshtein distance (the classic DP, identical
    in every engine): distance from each part name to its own brand
    string, bucketed into a histogram. Fuzzy-matching surface for the
    C6/C7-style canonicalization family."""
    part = load_table(spark, sf, "part")
    d = F.levenshtein(F.col("p_name"), F.col("p_brand"))
    return part.select(d.alias("d")).groupBy("d").agg(F.count("*").alias("c"))


B15_EDIT_SQL = """
SELECT levenshtein(p_name, p_brand) AS d, count(*) AS c
FROM part GROUP BY 1
"""

PROBES.append(Probe("b15_edit_distance", "B15", b15_edit_distance, B15_EDIT_SQL))


# ------------------------------------------------ B16: date spine gap fill
def b16_date_spine(spark: SparkSession, sf: str) -> DataFrame:
    """B16 breadth — calendar gap fill: generate the full month spine
    over the order date range (sequence + explode — no driver loop),
    left-join monthly order counts, zero-fill the empty months. The
    standard time-series densification every reporting pipeline needs;
    proves months with NO orders appear with n=0."""
    orders = load_table(spark, sf, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month")
    )
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.count("*").alias("n_raw"))
    return spine.join(monthly, "month", "left").select(
        "month", F.coalesce(F.col("n_raw"), F.lit(0)).alias("n_orders")
    )


B16_SPINE_SQL = """
WITH bounds AS (
  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
  FROM orders),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
  FROM bounds),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*) AS n_raw
  FROM orders GROUP BY 1)
SELECT s.month, coalesce(m.n_raw, 0) AS n_orders
FROM spine s LEFT JOIN monthly m ON s.month = m.month
"""

PROBES.append(Probe("b16_date_spine", "B16", b16_date_spine, B16_SPINE_SQL))


# ------------------------------------------------ B6: nearest as-of
def b06_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """B6 breadth — nearest-direction as-of join (operators/asof.py):
    per purchase, the closer of the latest click at-or-before and the
    earliest click at-or-after (backward wins ties). DuckDB's ASOF
    JOIN has no nearest mode, so the oracle replicates the exact
    union + two-window-fold formulation in SQL (IGNORE NULLS frames),
    making the comparison a true cross-engine check of the operator's
    semantics, not of a built-in."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(ev.event_type == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(ev.event_type == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        values=["click_value"],
        direction="nearest",
    ).select("user_id", "event_id", "ts", "click_value")


B06_NEAREST_SQL = """
WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts AS rts, value AS click_value FROM events
      WHERE event_type = 'click'),
u AS (
  SELECT user_id, ts, event_id,
         CAST(NULL AS DOUBLE) AS cv, CAST(NULL AS TIMESTAMP) AS rts, 1 AS side
  FROM l
  UNION ALL
  SELECT user_id, rts, NULL, click_value, rts, 0 FROM r),
w AS (
  SELECT *,
    last_value(cv IGNORE NULLS) OVER wb AS b_cv,
    last_value(rts IGNORE NULLS) OVER wb AS b_rts,
    first_value(cv IGNORE NULLS) OVER wf AS f_cv,
    first_value(rts IGNORE NULLS) OVER wf AS f_rts
  FROM u
  WINDOW
    wb AS (PARTITION BY user_id ORDER BY ts, side
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY user_id ORDER BY ts, side DESC
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, event_id, ts,
  CASE WHEN b_rts IS NOT NULL
            AND (f_rts IS NULL OR epoch(ts) - epoch(b_rts) <= epoch(f_rts) - epoch(ts))
       THEN b_cv
       WHEN f_rts IS NOT NULL THEN f_cv END AS click_value
FROM w WHERE side = 1
"""

PROBES.append(Probe("b06_asof_nearest", "B6", b06_asof_nearest, B06_NEAREST_SQL))
