"""Bucketed (co-located) joins — SURVEY scale posture.

For fact-fact joins repeated on the same key (lineitem⋈orders on
orderkey at every refresh), pay the shuffle ONCE at write time:
``bucketBy(n, key)`` + ``sortBy`` persists hash-bucketed, pre-sorted
tables; Spark then plans a SortMergeJoin with NO Exchange on either
side (asserted in tests/test_llm_ops.py by inspecting the physical
plan). At 100 TB this turns the dominant per-query shuffle of the
hot join into a one-time write cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (parquet)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables; with matching bucket specs
    Spark elides both shuffle Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
