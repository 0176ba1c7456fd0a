"""Streaming window operators (SURVEY.md §2 B21–B24).

Each transformation takes any events-shaped DataFrame — batch or
streaming — so the SAME plan runs in both modes; the replay tests
(tests/test_streaming.py) drop shuffled file batches into a directory,
run the streaming query with ``trigger(availableNow=True)``, and assert
the final state equals the batch run (exactly-once, late-data-safe).

Scale posture: event-time windows + watermarks bound state; the
aggregations are keyed by (window, type) / session — state store size
is O(active windows), not O(events). ``dropDuplicatesWithinWatermark``
bounds dedupe state the same way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession, path: str, fmt: str = "parquet", max_files_per_trigger: int = 4
) -> DataFrame:
    """B21 source — file-based streaming read with a fixed schema (file
    source gives exactly-once + replayable batches). A small
    ``max_files_per_trigger`` forces many micro-batches, which the
    replay/chaos tests use to exercise mid-stream recovery."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def tumbling_counts(
    events: DataFrame, width: str = "10 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """B21 — tumbling event-time window. ``watermark`` bounds state and
    defines lateness; pass None for an unbounded-state replay (exact
    batch equivalence regardless of arrival order)."""
    src = (
        events.withWatermark("ts", watermark)
        if events.isStreaming and watermark
        else events
    )
    win = F.window(F.col("ts"), width)
    return (
        src.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "c", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """B21 — sliding window variant."""
    src = (
        events.withWatermark("ts", watermark)
        if events.isStreaming and watermark
        else events
    )
    win = F.window(F.col("ts"), width, slide)
    return (
        src.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("c"))
        .select(F.col("w.start").alias("w_start"), "event_type", "c")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """B22 — native session windows (30-minute inactivity gap); the
    batch gaps-and-islands twin is plans/relational.py b22. Session
    merging REQUIRES dropping data older than the watermark, so an
    arrival-order-independent replay must pass watermark=None."""
    src = (
        events.withWatermark("ts", watermark)
        if events.isStreaming and watermark
        else events
    )
    return (
        src.groupBy(F.session_window(F.col("ts"), gap).alias("s"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("s_start"),
            F.col("s.end").alias("s_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """B24 — stateful streaming dedupe on event_id with bounded state;
    batch twin is a plain dropDuplicates(['event_id'])."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drive a streaming DataFrame to completion against the current
    file set (availableNow trigger) into an in-memory table; returns
    the final result as a batch DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def run_append_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Append-mode variant (B23: only watermark-finalized rows are
    emitted; B24 dedupe emits each event_id once)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Stream-stream (or batch) interval join: pair each left row with
    right rows of the same key whose timestamp falls in
    [left_ts - lookback, left_ts]. In streaming mode both sides carry
    watermarks and the time-bound condition lets Spark expire join
    state — the canonical bounded-state stream-stream join."""
    lts, rts = f"_l_{left_ts}", f"_r_{right_ts}"
    l = left.withColumnRenamed(left_ts, lts)
    r = right.withColumnRenamed(right_ts, rts)
    if left.isStreaming and watermark:
        l = l.withWatermark(lts, watermark)
    if right.isStreaming and watermark:
        r = r.withWatermark(rts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(rts) <= F.col(lts))
        & (F.col(rts) >= F.col(lts) - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond)


def hypertable_rollup(
    events: DataFrame,
    widths_seconds: tuple[int, ...] = (60, 600, 3600),
    value_col: str = "value",
) -> DataFrame:
    """TimescaleDB-style multi-resolution rollup (the 'hypertable
    rollup' custom-operator case): counts + exact sums for SEVERAL
    bucket widths in ONE scan, expressed as grouping sets over
    precomputed bucket columns — Catalyst expands to a single
    partial+final aggregation, no per-resolution rescan.

    Output: (resolution_s, bucket_start, event_type, c, sum_value) —
    one row per (width, bucket, type)."""
    buckets = {
        f"_b{w}": F.timestamp_seconds(
            (F.col("ts").cast("long") / F.lit(w)).cast("long") * F.lit(w)
        )
        for w in widths_seconds
    }
    src = events.withColumns(buckets)
    src.createOrReplaceTempView("_hyper_src")
    sets = ", ".join(f"(_b{w}, event_type)" for w in widths_seconds)
    cases = " ".join(
        f"WHEN _b{w} IS NOT NULL THEN {w}" for w in widths_seconds
    )
    coalesce_bucket = ", ".join(f"_b{w}" for w in widths_seconds)
    return events.sparkSession.sql(
        f"""
        SELECT CASE {cases} END AS resolution_s,
               coalesce({coalesce_bucket}) AS bucket_start,
               event_type,
               count(*) AS c,
               CAST(SUM(CAST({value_col} AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
        FROM _hyper_src
        GROUP BY GROUPING SETS ({sets})
        """
    )
