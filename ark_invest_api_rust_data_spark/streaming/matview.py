"""Streaming materialized-view maintenance (B21/B24 × the w02 batch
twin): row-level CDC micro-batches (full base rows + ``op`` ∈
{'insert','delete'}, the diff_lake_versions encoding) fold into a
versioned aggregate snapshot via ``operators.matview.matview_refresh``
— the base table is never read, each batch costs O(delta + groups).

State layout mirrors streaming/scd2.py: ``view/v=0`` is the seed
(``seed_view``); micro-batch N writes the refreshed snapshot to
``view/v=<N+1>``. Crash-replay safety is the same argument: a replayed
batch re-reads the latest version EXCLUDING its own target and
recomputes — the refresh is deterministic (exact int/decimal
arithmetic, matview.py module docstring), so the replayed snapshot is
byte-identical and the stream is exactly-once end to end without a
transactional sink. ``vacuum_versions`` retention: keep >= 2 while the
stream runs (the predecessor is the most recent batch's replay input).

The snapshot is O(groups) — tiny next to the base table — so
snapshot-per-batch is cheap; at warehouse scale partition the snapshot
by a group-key prefix and this loop rewrites only changed partitions
(dynamic partition overwrite, sources/parquet_store.write_lake).
"""

from __future__ import annotations

import os
import re
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession

from ..operators.matview import matview_refresh


def seed_view(view: DataFrame, store_root: str) -> None:
    """Write the seed aggregate snapshot (a matview_build output) as
    version 0."""
    view.write.mode("overwrite").parquet(f"{store_root}/view/v=0")


def _versions(store_root: str) -> list[int]:
    base = f"{store_root}/view"
    if not os.path.isdir(base):
        return []
    out = []
    for d in os.listdir(base):
        m = re.fullmatch(r"v=(\d+)", d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_view(spark: SparkSession, store_root: str) -> DataFrame:
    """The latest aggregate snapshot."""
    vs = _versions(store_root)
    if not vs:
        raise FileNotFoundError(f"no view snapshots under {store_root}")
    return spark.read.parquet(f"{store_root}/view/v={vs[-1]}")


def apply_matview_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_root: str,
    group_cols: list[str],
    measures: Mapping[str, Column],
    count_col: str = "n_rows",
    op_col: str = "op",
) -> None:
    """Fold one CDC micro-batch into the versioned view (exposed for
    replay tests; the stream calls exactly this). Empty batches are
    no-ops (no version written — a replay then re-lands on the same
    predecessor)."""
    if batch.isEmpty():
        return
    batch = batch.localCheckpoint(eager=True)  # cut source lineage
    me = batch_id + 1  # v=0 is the seed
    prev = [v for v in _versions(store_root) if v != me]
    if not prev:
        raise FileNotFoundError(f"seed_view missing under {store_root}")
    base = spark.read.parquet(f"{store_root}/view/v={prev[-1]}")
    refreshed = matview_refresh(
        base, batch, group_cols, measures, count_col=count_col, op_col=op_col
    )
    refreshed.write.mode("overwrite").parquet(f"{store_root}/view/v={me}")


def start_matview_stream(
    spark: SparkSession,
    cdc_stream: DataFrame,
    store_root: str,
    checkpoint: str,
    group_cols: list[str],
    measures: Mapping[str, Column],
    count_col: str = "n_rows",
    op_col: str = "op",
    query_name: str = "matview_maintenance",
    available_now: bool = True,
):
    """Start the view-maintenance stream over a CDC source carrying
    base-table rows + ``op``. Requires ``seed_view``."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        apply_matview_batch(
            spark,
            batch,
            batch_id,
            store_root,
            group_cols,
            measures,
            count_col=count_col,
            op_col=op_col,
        )

    writer = (
        cdc_stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vacuum_versions(store_root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` snapshots (keep >= 2 while the
    stream runs — see module docstring). Returns removed versions."""
    import shutil

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    vs = _versions(store_root)
    doomed = vs[:-keep] if keep < len(vs) else []
    for v in doomed:
        shutil.rmtree(f"{store_root}/view/v={v}", ignore_errors=True)
    return doomed
