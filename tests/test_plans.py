"""Physical-plan guarantees for the 100 TB posture.

The star joins must NOT hard-hint broadcast on unbounded (SF-proportional)
tables: a hard ``F.broadcast`` overrides AQE's size estimate and would OOM
the executors when customer/part/supplier are multi-GB (supplier is
SF×10k rows — its 7 hard hints were dropped in round 3). Only FIXED-size
dims (region=5, nation=25 rows at every SF) keep their hints. We verify by
setting the broadcast thresholds to -1 *after* plan construction
(load_table's tune() re-applies the default threshold during
construction): hinted tables still broadcast (hints override thresholds),
while unhinted ones must fall back to a shuffle join — and, separately,
that WITH the default 64 MB threshold AQE still picks broadcast for the
small-at-this-SF sides on its own.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

SF = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

_THRESH_KEYS = [
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
]


def _plan_without_auto_broadcast(spark, df) -> str:
    """Execute df with auto-broadcast disabled; return the final plan."""
    old = {}
    for k in _THRESH_KEYS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, "-1")
    try:
        df.collect()  # planning happens here, with thresholds off
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_star_join_customer_not_hard_broadcast(spark):
    from ark_invest_api_rust_data_spark.plans.relational import b02_star_join

    df = b02_star_join(spark, SF)
    plan = _plan_without_auto_broadcast(spark, df)
    # bounded dims (nation/region) are hinted → broadcast survives
    # threshold=-1
    assert "BroadcastHashJoin" in plan
    # customer/supplier (and the fact-fact join) are unhinted → with
    # thresholds off they must NOT broadcast
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_star_join_unhinted_sides_broadcast_via_size_estimate(spark):
    """The flip side of dropping the hard supplier hint (round-3 verdict
    item 2): with the DEFAULT 64 MB threshold, the planner must still
    choose broadcast for customer/supplier at this SF from their size
    estimates alone — every join in the executed star plan is a
    BroadcastHashJoin except none at all should need a sort-merge."""
    from ark_invest_api_rust_data_spark.plans.relational import b02_star_join

    df = b02_star_join(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # all five joins (orders, customer, supplier, nation, region sides)
    # resolve to broadcast at sf0.001 under the default threshold — a
    # surviving SortMergeJoin would mean the size estimate no longer
    # reaches the unhinted sides
    assert "SortMergeJoin" not in plan


def test_lake_read_partition_prunes(spark):
    """The lake read path must prune: the scan's PartitionFilters carry
    the ticker/date predicates, and only matching partition directories
    are read (file count in the scan < total lake files)."""
    from ark_invest_api_rust_data_spark.plans.lake import (
        build_orders_lake,
        s02_lake_pruned_read,
    )

    df = s02_lake_pruned_read(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "ticker" in plan.split("PartitionFilters")[1][:400]

    import glob

    root = build_orders_lake(spark, SF)
    total = len(glob.glob(f"{root}/holdings/*/*/*.parquet"))
    selected = len(glob.glob(f"{root}/holdings/ticker=F/date=1997-*/*.parquet"))
    assert 0 < selected < total
    # the filtered scan reads only the selected partition files
    filtered = (
        spark.read.parquet(f"{root}/holdings")
        .filter(
            (F.col("ticker") == "F")
            & (F.col("date") >= F.lit("1997-01-01").cast("date"))
            & (F.col("date") < F.lit("1998-01-01").cast("date"))
        )
    )
    scanned = filtered.select(F.input_file_name()).distinct().count()
    assert scanned == selected


@pytest.mark.parametrize(
    "probe_name",
    [
        "b05_theta_join",
        "b08_supplier_cnt_q16",
        "b02_q3_shipping_priority",
        "q13_customer_distribution",
        "q19_disjunctive_pushdown",
    ],
)
def test_unbounded_tables_not_hard_broadcast(spark, probe_name):
    from ark_invest_api_rust_data_spark.plans import relational, tpch_extra

    fn = getattr(relational, probe_name, None) or getattr(tpch_extra, probe_name)
    plan = _plan_without_auto_broadcast(spark, fn(spark, SF))
    assert "BroadcastHashJoin" not in plan, (
        f"{probe_name} still hard-hints broadcast on an unbounded table"
    )


from contextlib import contextmanager


@contextmanager
def _full_metadata(spark):
    """Plan strings truncate scan metadata at 100 chars by default —
    long PushedFilters/ReadSchema lists need the cap raised to be
    assertable."""
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        yield
    finally:
        spark.conf.set(key, old)


@pytest.mark.parametrize(
    "probe_name,pushed_fragment",
    [
        # Q6: tight range predicates must reach the parquet scan
        ("b07_forecast_q6", "GreaterThanOrEqual(l_shipdate"),
        # Q3: segment equality + date range pushed on both sides
        ("b02_q3_shipping_priority", "LessThan(o_orderdate"),
        # Q19: the whole OR-of-ANDs quantity disjunction is pushed
        ("q19_disjunctive_pushdown", "Or(Or(And(GreaterThanOrEqual(l_quantity"),
    ],
)
def test_filter_pushdown_reaches_scan(spark, probe_name, pushed_fragment):
    """Filters must appear in the scan's PushedFilters — at 100 TB the
    difference between a row-group skip and a full read."""
    from ark_invest_api_rust_data_spark.plans import relational, tpch_extra

    fn = getattr(relational, probe_name, None) or getattr(tpch_extra, probe_name)
    with _full_metadata(spark):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert pushed_fragment in plan, plan[:4000]


def test_column_pruning_reaches_scan(spark):
    """Q1 touches 7 of lineitem's 16 columns; the scan's ReadSchema
    must carry only those — a scan reading all columns for a narrow
    aggregation would move ~2x the bytes at any scale."""
    from ark_invest_api_rust_data_spark.catalog import load_table
    from ark_invest_api_rust_data_spark.plans.relational import b07_agg_q1

    with _full_metadata(spark):
        plan = b07_agg_q1(spark, SF)._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    total_cols = len(load_table(spark, SF, "lineitem").columns)
    read_cols = read_schema.count(":")  # struct<a:t,b:t,...> field count
    assert read_cols < total_cols, read_schema
    assert "l_comment" not in read_schema
    assert "l_quantity" in read_schema and "l_shipdate" in read_schema


def test_sampling_ops_shuffle_shape(spark):
    """Scale contract of the corpus-prep ops: split/sample assignment
    is a pure narrow map (zero Exchanges — composes with any scan at
    any size); sequence packing shuffles exactly once, on the shard
    key its window partitions by."""
    from ark_invest_api_rust_data_spark.plans.llm import (
        llm_sequence_pack,
        llm_split_sample,
    )

    split_plan = (
        llm_split_sample(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in split_plan, split_plan[:2000]

    pack_plan = (
        llm_sequence_pack(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert pack_plan.count("Exchange") == 1, pack_plan[:2000]
    assert "hashpartitioning(source" in pack_plan


def test_runtime_bloom_filter_injects(spark):
    """Scan-side row-level pruning at scale: with a selective dimension
    filter and a non-broadcastable build side, Catalyst injects a
    runtime BLOOM FILTER on the fact scan (bloom_filter_agg on the
    creation side, might_contain on the application side) — the
    100 TB mechanism that keeps a fact scan from shipping rows a
    selective dim filter will discard anyway. Thresholds are scoped:
    broadcast disabled (forcing the shuffle-join regime where bloom
    pays) and the app-side scan size floor dropped for test data.
    NOTE: confs are set AFTER any load_table call — session.tune()
    re-pins the broadcast threshold."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        sf = "/root/testdata/sf0.01"
        lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quality_filter_fold_stays_above_spread_exchange(spark):
    """Regression (round-3 scale audit, twice): quality_filter's
    keep_docs verdict fold must NOT be pushed below the _spread
    exchange — inlined into the scan stage it runs on however few
    splits the file has (serialized 10x at sf0.1/sf1). The fold is
    held above by a non-deterministic guard; Spark 4's OptimizeRand
    folds bound comparisons on rand() (rand >= -1 -> true), which
    silently removed the first guard — so assert BOTH that the guard
    expression survives optimization and that the Filter sits above
    the Exchange."""
    from ark_invest_api_rust_data_spark.catalog import load_table
    from ark_invest_api_rust_data_spark.operators.text import quality_filter

    docs = load_table(spark, SF, "documents")
    plan = (
        quality_filter(docs, keep_docs=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rand" in plan, "nd guard was optimized away:\n" + plan[:2000]
    i_filter, i_exchange = plan.find("Filter"), plan.find("Exchange")
    assert i_exchange != -1, plan[:2000]
    assert 0 <= i_filter < i_exchange, (
        "verdict filter was pushed below the spread exchange:\n" + plan[:2000]
    )


def test_exact_percentile_hist_equals_builtin(spark):
    """B8 hardening (r4): the histogram tier must equal the built-in
    percentile_disc on every group — including ties, single-value
    groups, negative values, and boundary percentiles where
    cum/n == p exactly."""
    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.operators.percentile import (
        exact_percentile_hist,
    )

    rows = []
    rows += [("a", float(v)) for v in [1, 1, 1, 2, 2, 3, 10, 10, 100, -5]]
    rows += [("b", 7.0)]  # single value
    rows += [("c", float(v)) for v in range(1, 5)]  # n=4: p=0.5 hits cum/n==p
    rows += [("d", float(v % 3)) for v in range(100)]  # heavy ties
    df = spark.createDataFrame(rows, "g string, v double")
    ps = {"p0": 0.0, "p25": 0.25, "p50": 0.5, "p90": 0.9, "p100": 1.0}
    got = {
        r["g"]: tuple(r[k] for k in ps)
        for r in exact_percentile_hist(df, ["g"], "v", ps).collect()
    }
    exprs = [
        F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)").alias(k)
        for k, p in ps.items()
    ]
    want = {
        r["g"]: tuple(r[k] for k in ps)
        for r in df.groupBy("g").agg(*exprs).collect()
    }
    assert got == want


def test_exact_percentile_hist_nulls_and_validation(spark):
    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.operators.percentile import (
        exact_percentile_hist,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    (row,) = exact_percentile_hist(df, ["g"], "v", {"p50": 0.5}).collect()
    assert row["p50"] == 1.0  # nulls excluded, n=2, cum/n>=0.5 at first value

    # ADVICE r4: an ALL-null group must still appear, with null
    # percentiles — exactly what the built-in aggregate returns
    df2 = spark.createDataFrame(
        [("a", 1.0), ("z", None), ("z", None)], "g string, v double"
    )
    got = {
        r["g"]: r["p50"]
        for r in exact_percentile_hist(df2, ["g"], "v", {"p50": 0.5}).collect()
    }
    want = {
        r["g"]: r["p50"]
        for r in df2.groupBy("g")
        .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("p50"))
        .collect()
    }
    assert got == want == {"a": 1.0, "z": None}
    import pytest

    with pytest.raises(ValueError):
        exact_percentile_hist(df, ["g"], "v", {})
    with pytest.raises(ValueError):
        exact_percentile_hist(df, ["g"], "v", {"p": 1.5})


def test_exact_percentile_hist_null_group_keys(spark):
    """ADVICE r5: a NULL group key is a regular group for
    percentile_disc (groupBy treats null as a value) — the histogram
    tier's joins must be null-safe or such groups get null percentiles
    (single-col and multi-col keys, including partially-null tuples)."""
    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.operators.percentile import (
        exact_percentile_hist,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 9.0), (None, None)],
        "g string, v double",
    )
    got = {
        r["g"]: r["p50"]
        for r in exact_percentile_hist(df, ["g"], "v", {"p50": 0.5}).collect()
    }
    want = {
        r["g"]: r["p50"]
        for r in df.groupBy("g")
        .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("p50"))
        .collect()
    }
    assert got == want == {"a": 1.0, None: 5.0}

    df2 = spark.createDataFrame(
        [("a", None, 2.0), ("a", None, 4.0), (None, None, 7.0), ("a", "x", 1.0)],
        "g1 string, g2 string, v double",
    )
    res = exact_percentile_hist(df2, ["g1", "g2"], "v", {"p50": 0.5})
    got2 = {(r["g1"], r["g2"]): r["p50"] for r in res.collect()}
    want2 = {
        (r["g1"], r["g2"]): r["p50"]
        for r in df2.groupBy("g1", "g2")
        .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("p50"))
        .collect()
    }
    assert got2 == want2
    assert got2[("a", None)] == 2.0 and got2[(None, None)] == 7.0


def test_ann_join_query_side_broadcasts_and_no_cartesian(spark):
    """ann_join's executed plan: the query probe side rides a
    broadcast hash join on the cluster key (the query batch is small
    by contract), and nothing degenerates to a cartesian/nested-loop
    join except the one-row coords frame the centroid fold reads."""
    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.catalog import load_table
    from ark_invest_api_rust_data_spark.operators.similarity import ann_join

    emb = load_table(spark, SF, "embeddings")
    df = ann_join(
        emb.filter(F.col("vec_id") >= 5),
        emb.filter(F.col("vec_id") < 5),
        k=3, n_centroids=8, iters=2, nprobe=2, train=emb,
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the candidate join must be the equi-join on `cluster`, not a
    # post-filtered cross join
    assert "cluster" in plan


def test_agg_pushdown_plan_reads_footers_only(spark, sf_dir):
    """s08_agg_pushdown's frozen plan must carry PushedAggregation
    (COUNT/MIN/MAX answered from parquet footers — no data pages);
    and the scoped conf must be restored afterwards so other probes
    keep measuring real scans."""
    from ark_invest_api_rust_data_spark.plans.formats import s08_agg_pushdown

    key = "spark.sql.parquet.aggregatePushdown"
    before = spark.conf.get(key, "false")
    df = s08_agg_pushdown(spark, sf_dir)
    assert spark.conf.get(key, "false") == before  # conf restored
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation" in plan and "COUNT(*)" in plan
    row = df.collect()[0]
    assert row["n_rows"] > 0 and row["min_okey"] <= row["max_okey"]
