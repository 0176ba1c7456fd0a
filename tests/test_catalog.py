"""load_table type normalization: the driver regenerates testdata
between rounds and physical parquet types have flipped before
(events.ts: TIMESTAMP(NANOS) in round 1 → timestamp[us] NTZ in round
2). Simulate every plausible future flip and assert the canonical
types come back with wall-clock values intact."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from ark_invest_api_rust_data_spark.catalog import load_table

WALL = dt.datetime(1997, 3, 15, 12, 30, 0)


def _write(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_orders_date_flip_normalizes(spark, tmp_path):
    """o_orderdate shipped as DATE / NTZ / UTC-instant must all load as
    TIMESTAMP_NTZ with the same wall clock."""
    base = spark.range(1).select(
        F.col("id").alias("o_orderkey"),
        F.lit(WALL).cast("timestamp_ntz").alias("o_orderdate"),
    )
    for flip, caster in [
        ("ntz", lambda c: c.cast("timestamp_ntz")),  # today's physical type
        ("date", lambda c: c.cast("date")),
        ("utc", lambda c: c.cast("timestamp")),  # UTC-instant (session UTC)
    ]:
        d = str(tmp_path / flip)
        _write(base.withColumn("o_orderdate", caster(F.col("o_orderdate"))), f"{d}/orders.parquet")
        got = load_table(spark, d, "orders")
        assert dict(got.dtypes)["o_orderdate"] == "timestamp_ntz", flip
        val = got.first()["o_orderdate"]
        expected = WALL if flip != "date" else WALL.replace(hour=0, minute=0)
        assert val == expected, (flip, val)


def test_events_ts_flip_normalizes(spark, tmp_path):
    """events.ts as NTZ / UTC / int64-nanos must all load as session-TZ
    TIMESTAMP (numeric casts legal) with the same wall clock."""
    nanos = int(WALL.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000)
    cases = {
        "ntz": lambda df: df.withColumn("ts", F.col("ts").cast("timestamp_ntz")),
        "tz": lambda df: df,
        "nanos_as_long": lambda df: df.withColumn("ts", F.lit(nanos).cast("long")),
    }
    base = spark.range(1).select(
        F.col("id").alias("event_id"), F.lit(WALL).cast("timestamp").alias("ts")
    )
    for flip, xform in cases.items():
        d = str(tmp_path / flip)
        _write(xform(base), f"{d}/events.parquet")
        got = load_table(spark, d, "events")
        assert dict(got.dtypes)["ts"] == "timestamp", flip
        assert got.first()["ts"] == WALL, flip
        # epoch arithmetic must be legal (the round-2 breakage)
        assert got.select(F.col("ts").cast("long")).first()[0] > 0
