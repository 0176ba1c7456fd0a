"""Driver contract for the spark-graft builder (PySpark target).

Backed by ark_invest_api_rust_data_spark.plans — each registered Probe
pairs an idiomatic Spark DataFrame plan with an ANSI-SQL DuckDB oracle
(SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python WORKERS (pandas_udf / mapInPandas) unpickle functions that
# reference this package by module name; they inherit the driver
# process env, not its sys.path — export before any worker spawns.
if _REPO not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from ark_invest_api_rust_data_spark.plans import all_probes
from ark_invest_api_rust_data_spark.plans.relational import b02_star_join


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q5-shaped
    star join (broadcast dims + shuffled fact join + decimal-exact agg)."""
    return b02_star_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: p.spark for name, p in all_probes().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted → the
    driver records a weaker rows-only check)."""
    return {name: p.oracle for name, p in all_probes().items() if p.oracle is not None}
