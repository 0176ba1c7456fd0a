"""Pipeline data-quality counters via Spark's Observation API.

A production refresh wants to know — per run — how many rows arrived,
how many dates failed to parse, how many rows carry no usable
identifier, whether any value column went negative. Counting those
with separate actions would re-scan the input; ``df.observe`` attaches
the aggregates to the EXISTING action, so the counters ride the write
for free (they are accumulated by the same tasks that produce the
output — zero extra passes, works identically on a 100 TB run).

Usage::

    observed, obs = observe_quality(normalized)
    write(observed)              # any action materializes the metrics
    obs.get                      # {'rows': ..., 'null_dates': ..., ...}

The reference surfaces only a diagnostic tail print
(/root/reference/src/main.rs:18-25); this is the engine-native upgrade.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observe_quality(
    df: DataFrame, name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach data-quality counters for whichever canonical columns are
    present; returns the observed frame plus the Observation handle
    (read ``obs.get`` after the next action)."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    if "date" in df.columns:
        metrics.append(
            F.sum(F.when(F.col("date").isNull(), 1).otherwise(0)).alias("null_dates")
        )
    if "ticker" in df.columns and "cusip" in df.columns:
        metrics.append(
            F.sum(
                F.when(F.col("ticker").isNull() & F.col("cusip").isNull(), 1).otherwise(0)
            ).alias("unidentified_rows")
        )
    if "market_value" in df.columns:
        metrics.append(
            F.sum(F.when(F.col("market_value") < 0, 1).otherwise(0)).alias(
                "negative_market_values"
            )
        )
    if "weight" in df.columns:
        metrics.append(F.max("weight").alias("max_weight"))
    return df.observe(obs, *metrics), obs
