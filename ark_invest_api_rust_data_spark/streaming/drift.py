"""Streaming distribution-drift monitor (B23 × the b07 drift probe):
micro-batches of a numeric column are scored against a FROZEN
reference snapshot's histogram — the online "did upstream silently
change?" alarm that pages before a poisoned day of data lands in
training shards.

The reference side is computed once (``freeze_reference`` collects the
O(buckets) histogram to the driver and re-creates it as a literal
frame — buckets are fixed-width so the frame is tiny and static);
each micro-batch then costs ONE map-side-combined bucket count over
the batch plus the O(buckets) report join. Zero streaming state, no
watermark: every batch is scored independently, which is exactly the
monitoring semantics (per-interval drift, not cumulative).

Reports land idempotently under ``out_root/drift/src=b<N>`` —
overwrite per batch-id partition, the crash-replay contract shared
with streaming/ingest.py (a replayed batch replaces its own report;
the math is integer-deterministic, so the replacement is
byte-identical)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.quality import bucket_counts, drift_report


def freeze_reference(
    ref: DataFrame, value_col: str, bucket_width: int
) -> tuple[list[tuple[int, int]], int]:
    """One-time reference histogram: [(bucket, count)], total — a
    driver-side constant (O(buckets), bounded by the value domain /
    width, NOT by reference rows)."""
    rows = bucket_counts(ref, value_col, bucket_width, "cnt_a").collect()
    hist = sorted((int(r["bucket"]), int(r["cnt_a"])) for r in rows)
    n = sum(c for _, c in hist)
    if n == 0:
        raise ValueError("reference snapshot has no non-null values")
    return hist, n


def drift_batch(
    spark: SparkSession,
    batch: DataFrame,
    ref_hist: list[tuple[int, int]],
    ref_n: int,
    value_col: str,
    bucket_width: int,
) -> DataFrame:
    """Score one batch against the frozen reference (exposed for
    tests; the stream calls exactly this). Reference is side A, the
    batch side B — positive psi_contrib mass means the batch moved
    away from the reference."""
    ca = spark.createDataFrame(ref_hist, "bucket long, cnt_a long")
    # one batch scan: total from the materialized O(buckets) histogram
    cb = bucket_counts(batch, value_col, bucket_width, "cnt_b").localCheckpoint(
        eager=True
    )
    nb = int(cb.agg(F.coalesce(F.sum("cnt_b"), F.lit(0))).collect()[0][0])
    # an all-NULL batch (upstream corruption — the event this monitor
    # exists to catch) must not kill the stream: its histogram is
    # empty, every cnt_b is 0, and the report is then invariant to
    # the divisor, so nb=1 yields the exact one-sided report
    # (q_ppm = 0 per reference bucket, full positive PSI mass)
    return drift_report(ca, cb, ref_n, max(nb, 1))


def start_drift_stream(
    spark: SparkSession,
    stream: DataFrame,
    ref_hist: list[tuple[int, int]],
    ref_n: int,
    value_col: str,
    bucket_width: int,
    out_root: str,
    checkpoint: str,
    query_name: str = "drift_monitor",
    available_now: bool = True,
):
    """Start the monitor over a stream carrying ``value_col``; one
    report directory per micro-batch. Empty batches write nothing."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)
        report = drift_batch(
            spark, batch, ref_hist, ref_n, value_col, bucket_width
        )
        report.write.mode("overwrite").parquet(
            f"{out_root}/drift/src=b{batch_id}"
        )

    writer = (
        stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
