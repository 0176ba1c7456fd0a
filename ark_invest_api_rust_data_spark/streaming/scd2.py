"""Streaming SCD Type-2 dimension maintenance (B24 × U5): dimension
updates arrive continuously; each micro-batch merges into the
versioned dimension with `operators.merge.scd2_apply` semantics
(close-and-open on real changes, no-op updates untouched, unknown
keys inserted).

State layout under ``store_root``: ``dim/v=0`` is the seed snapshot
(``seed_dim``); micro-batch N writes the full post-merge snapshot to
``dim/v=<N+1>``. Crash-replay safety mirrors streaming/ingest.py: a
replayed batch re-reads the LATEST version EXCLUDING its own target
(the crashed attempt's partial output is both stale input and the
overwrite target), recomputes, and overwrites — merging is
deterministic, so the replayed snapshot is byte-identical and the
stream is exactly-once end to end without a transactional sink.

Snapshot-per-batch is the right shape here because SCD2 rewrites the
OPEN slice (valid_to of changed rows): at warehouse scale the same
loop writes open and closed slices to separate prefixes so each batch
rewrites O(open) not O(history) — the closed slice is append-only by
construction (scd2_apply never touches closed rows).

Within a batch, multiple updates for one key collapse to the
latest-effective row via an exact struct-max (lexicographic on
(effective, tracked...)) — deterministic, no last-wins race.
"""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import scd2_apply


def seed_dim(dim: DataFrame, store_root: str) -> None:
    """Write the seed dimension snapshot as version 0."""
    dim.write.mode("overwrite").parquet(f"{store_root}/dim/v=0")


def _versions(store_root: str) -> list[int]:
    base = f"{store_root}/dim"
    if not os.path.isdir(base):
        return []
    out = []
    for d in os.listdir(base):
        m = re.fullmatch(r"v=(\d+)", d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_dim(spark: SparkSession, store_root: str) -> DataFrame:
    """The latest dimension snapshot."""
    vs = _versions(store_root)
    if not vs:
        raise FileNotFoundError(f"no dimension snapshots under {store_root}")
    return spark.read.parquet(f"{store_root}/dim/v={vs[-1]}")


def apply_scd2_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_root: str,
    key: str,
    tracked: list[str],
    effective_col: str = "effective",
) -> None:
    """Merge one micro-batch into the versioned dimension (exposed for
    replay tests; the stream calls exactly this).

    Per-row effective dates are honored: the batch is sub-merged once
    per distinct effective date in ASCENDING order, so a key updated
    effective 2024-01-02 inside a batch whose max is 2024-01-09 gets
    valid_from 2024-01-02 (and an intermediate version row if the key
    changes again later in the same batch). Within one effective date,
    multiple updates for a key collapse to the struct-max of the
    tracked values — deterministic, no last-wins race. Updates whose
    effective predates the already-open row's valid_from are no-ops
    (scd2_apply's stale guard); the stream contract is
    monotonic-effective ACROSS batches, replay-deterministic within.

    The distinct-dates collect is bounded by the number of calendar
    dates inside ONE micro-batch — O(days), not O(rows).

    A NULL effective date is a contract violation (the stream contract
    requires monotonic effective dates) and raises ``ValueError``
    rather than silently dropping the rows — same loud-failure policy
    as the strict media decoders (ADVICE r4).
    """
    if batch.isEmpty():
        return
    batch = batch.localCheckpoint(eager=True)  # cut source lineage
    me = batch_id + 1  # v=0 is the seed
    prev = [v for v in _versions(store_root) if v != me]
    if not prev:
        raise FileNotFoundError(f"seed_dim missing under {store_root}")
    dim = spark.read.parquet(f"{store_root}/dim/v={prev[-1]}")

    raw_dates = [
        r[0] for r in batch.select(effective_col).distinct().collect()
    ]
    if any(d is None for d in raw_dates):
        raise ValueError(
            f"batch {batch_id}: NULL {effective_col!r} values violate the "
            "SCD2 stream contract (monotonic effective dates); refusing to "
            "silently drop rows"
        )
    dates = sorted(raw_dates)
    for i, eff in enumerate(dates):
        latest = (
            batch.filter(F.col(effective_col) == F.lit(eff))
            .groupBy(key)
            .agg(F.max(F.struct(effective_col, *tracked)).alias("_s"))
            .select(key, *[F.col(f"_s.{c}").alias(c) for c in tracked])
        )
        dim = scd2_apply(dim, latest, key=key, tracked=tracked, effective=str(eff))
        if i < len(dates) - 1 and len(dates) > 2:
            # deep sub-batch chains: cut the plan so the final write
            # doesn't re-derive every intermediate merge
            dim = dim.localCheckpoint(eager=True)
    dim.write.mode("overwrite").parquet(f"{store_root}/dim/v={me}")


def start_scd2_stream(
    spark: SparkSession,
    stream_updates: DataFrame,
    store_root: str,
    checkpoint: str,
    key: str,
    tracked: list[str],
    effective_col: str = "effective",
    query_name: str = "scd2_maintenance",
    available_now: bool = True,
):
    """Start the dimension-maintenance stream over an updates source
    carrying (key, tracked..., effective). Requires ``seed_dim``."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        apply_scd2_batch(
            spark, batch, batch_id, store_root, key, tracked, effective_col
        )

    writer = (
        stream_updates.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vacuum_versions(store_root: str, keep: int = 2) -> list[int]:
    """Retention for the snapshot store: drop all but the newest
    ``keep`` versions (the latest is the live dimension; keeping one
    predecessor preserves the crash-replay input for the most recent
    batch — never vacuum below 2 while the stream runs). Returns the
    removed version numbers."""
    import shutil

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    vs = _versions(store_root)
    doomed = vs[:-keep] if keep < len(vs) else []
    for v in doomed:
        shutil.rmtree(f"{store_root}/dim/v={v}", ignore_errors=True)
    return doomed
