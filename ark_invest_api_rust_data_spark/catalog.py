"""Table loaders for the driver testdata lake (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under ``{sf_dir}/``.

All loads are lazy parquet scans (predicate/projection pushdown engages
naturally). The only shim is ``events.ts``, whose physical type has
varied across testdata generations:

* TIMESTAMP(NANOS) — Spark's reader rejects it, so we read the raw
  int64 nanos (spark.sql.legacy.parquet.nanosAsLong) and rebuild a
  microsecond timestamp;
* timestamp[us] with isAdjustedToUTC=false — Spark 4 infers
  TIMESTAMP_NTZ, which cannot be cast to numeric types and would
  diverge from the rest of the engine; we cast to the session-TZ
  TIMESTAMP (session tz is pinned UTC, so the wall-clock values are
  unchanged and DuckDB oracles agree).
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
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # int64 nanos → timestamp (μs). DuckDB returns μs-precision
            # timestamps for the same file, so oracles agree.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
            )
        elif ts_type == "timestamp_ntz":
            # NTZ → session-TZ timestamp (UTC): same wall-clock values,
            # but numeric casts / epoch arithmetic become legal again.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql probes."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
