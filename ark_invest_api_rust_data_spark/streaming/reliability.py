"""Streaming reliability: state-store configuration and exactly-once
sink patterns (SURVEY.md §2 B23/B24 operational surface; reference runs
its scheduler forever — src/main.rs keeps a tokio loop alive — so the
Spark translation must survive restarts with state intact).

Two concerns a 100 TB streaming deployment has that local tests don't:

1. **State store capacity.** The default HDFSBackedStateStoreProvider
   keeps every key in executor heap — fine for thousands of windows,
   fatal for billions of dedupe keys. RocksDBStateStoreProvider spills
   to local SSD and (with changelog checkpointing) uploads only the
   delta per batch instead of re-snapshotting the full store.
2. **Exactly-once delivery across crashes.** Spark's file sink is
   exactly-once via its own commit log, but external stores (JDBC,
   key-value) need an idempotent `foreachBatch`: the SAME (batch_id,
   data) may be redelivered after a crash and must overwrite, not
   append.

Both are expressed here as small composable helpers so every streaming
operator in windows.py / stateful.py can opt in without changing its
plan. Chaos coverage: tests/test_streaming.py kills a running query
mid-stream and restarts from the same checkpoint (file-sink path), and
replays duplicated files across a stop/restart boundary (RocksDB state
survival path).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def use_rocksdb_state_store(spark: SparkSession, changelog: bool = True) -> None:
    """Switch newly-started streaming queries to the RocksDB state
    store. ``changelog=True`` uploads per-batch deltas to the
    checkpoint instead of full snapshots — the difference between O(Δ)
    and O(state) checkpoint traffic when dedupe state is ~10⁹ keys.

    Takes effect for queries started AFTER the call; running queries
    keep the provider recorded in their checkpoint.
    """
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_CONF, str(changelog).lower())


@contextmanager
def rocksdb_state_store(spark: SparkSession, changelog: bool = True) -> Iterator[None]:
    """Scoped variant: restores the previous provider on exit so a
    shared session (tests, notebooks) isn't permanently switched."""
    prev_provider = spark.conf.get(_PROVIDER_CONF, None)
    prev_changelog = spark.conf.get(_CHANGELOG_CONF, None)
    use_rocksdb_state_store(spark, changelog)
    try:
        yield
    finally:
        for key, prev in ((_PROVIDER_CONF, prev_provider), (_CHANGELOG_CONF, prev_changelog)):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


def start_idempotent_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str,
    available_now: bool = True,
    output_mode: str = "append",
):
    """Exactly-once external sink via idempotent ``foreachBatch``: each
    micro-batch lands in ``path/batch_id=N`` with overwrite semantics,
    so a post-crash redelivery of batch N replaces rather than
    duplicates it. This is the canonical pattern for sinks WITHOUT a
    transactional commit log (JDBC, object stores written by external
    jobs); Spark's native file sink doesn't need it.

    Readers take ``spark.read.parquet(path)`` — batch_id is a partition
    column they can drop.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # deterministic target per batch id — replays overwrite in place
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
