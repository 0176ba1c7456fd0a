"""Table loaders for the driver testdata lake (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under ``{sf_dir}/``.

All loads are lazy parquet scans (predicate/projection pushdown engages
naturally). The only shim is ``events``: the file stores
TIMESTAMP(NANOS) which Spark's parquet reader rejects, so we read the
raw int64 nanos (spark.sql.legacy.parquet.nanosAsLong) and rebuild a
microsecond timestamp — semantics identical to DuckDB's read at μs
precision.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import tune

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos → timestamp (μs). DuckDB returns μs-precision
        # timestamps for the same file, so oracles agree.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql probes."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
