"""Streaming ANN-lake ingest — the Structured Streaming twin of the
batch IVF-PQ append lifecycle (plans/corpus.llm_ivfpq_append).

The 100 TB serving story for vector search is: train coarse + PQ ONCE,
then documents arrive continuously and must become searchable without
retraining and without rewriting the lake. This module runs that loop
as a stream: each micro-batch is frozen-encoded (operators/pq.
pq_encode_batch) and frozen-assigned (operators/clustering.
assign_to_centroids) — zero driver state beyond the bounded model —
and written as ONE idempotent partition overwrite.

Lake layout: ``{root}/src=<batch>/cluster=<cid>/*.parquet`` — a
two-level hive partitioning.

* ``src=`` is the exactly-once unit: foreachBatch replays after a
  crash re-run the SAME batch id (checkpoint contract), and the
  per-src ``mode("overwrite")`` makes the rewrite byte-idempotent. A
  stream restarted with a FRESH checkpoint over the same source files
  reproduces the same (batch id → rows) mapping (deterministic file
  order + maxFilesPerTrigger) and overwrites each src with identical
  content — no duplicates either way. This is the band store's
  ``src=`` discipline (streaming/ingest.py) applied to codes.
* ``cluster=`` is the serving unit: a frozen search's
  ``cluster IN (probed)`` predicate prunes to nprobe directories PER
  SRC — Spark prunes on any partition column, so the scan cost is
  O(nprobe · srcs) directories of codes, independent of corpus size
  (the llm_ivfpq_persisted posture; runtime-asserted in
  tests/test_pq.py over a streamed lake). Compaction of many small
  srcs into one generation is the same fold the band store runs and
  is deliberately decoupled from serving.

Search serves the UNION of everything ingested so far through the
unchanged ``IvfPqIndex.search`` — the codes schema is identical, the
extra ``src`` partition column is simply not selected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.clustering import assign_to_centroids
from ..operators.pq import IvfPqIndex, pq_encode_batch


def encode_batch_for_lake(
    index: IvfPqIndex, batch: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_0..m-1, cluster) for one batch under the FROZEN
    models — the exact rows a lake partition holds. One narrow join of
    the two frozen passes, co-keyed on the id."""
    codes = pq_encode_batch(index.pq, batch, vec_col=vec_col)
    cells = assign_to_centroids(
        batch, index.coarse, id_col=id_col, vec_col=vec_col
    ).select(id_col, "cluster")
    return codes.join(cells, id_col)


def seed_code_lake(
    index: IvfPqIndex, df: DataFrame, lake_root: str, src: str = "corpus",
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> None:
    """Write the training corpus's codes as the lake's first ``src=``
    generation (frozen encode — bit-identical to what
    ``IvfPqIndex.build`` wrote at its flat path, re-laid-out under the
    streaming lake's two-level scheme)."""
    (
        encode_batch_for_lake(index, df, id_col=id_col, vec_col=vec_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cluster")
        .parquet(f"{lake_root}/src={src}")
    )


def start_pq_ingest_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    index: IvfPqIndex,
    lake_root: str,
    checkpoint: str,
    query_name: str = "pq_ingest",
    available_now: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """foreachBatch loop: frozen-encode each arriving micro-batch and
    overwrite its ``src=b<id>`` partition. No retraining, no driver
    state, no read of existing lake data — each batch costs one narrow
    encode + one partitioned write."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        (
            encode_batch_for_lake(index, batch, id_col=id_col, vec_col=vec_col)
            .write.mode("overwrite")
            # pin static per-write: a src= rewrite is ALWAYS the whole
            # partition (idempotence contract), and static-mode commits
            # write the _SUCCESS marker compaction's committed-only
            # check requires — immune to session-level dynamic leaks
            .option("partitionOverwriteMode", "static")
            .partitionBy("cluster")
            .parquet(f"{lake_root}/src=b{batch_id}")
        )

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def search_code_lake(
    spark: SparkSession,
    index: IvfPqIndex,
    lake_root: str,
    query: list[float],
    nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """Frozen union search over the LIVE lake — the unchanged
    ``IvfPqIndex`` ADC plan over the tombstone-pruned view (retired
    ``src=`` generations produce no scan tasks; both ``src`` and
    ``cluster`` predicates are partition filters). Before any
    compaction the live view is simply every src."""
    from .ingest import read_live_partitions

    codes = read_live_partitions(spark, lake_root)
    return index.search_frame(codes, query, nprobe=nprobe, topk=topk)


def compact_code_lake(
    spark: SparkSession,
    lake_root: str,
    retired_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    target_files: int | None = None,
) -> dict:
    """Fold the accumulated per-batch ``src=`` generations into ONE
    ``compact_g<N>`` generation that KEEPS the ``cluster=`` hive
    layout (so nprobe pruning is unchanged), with the band store's
    full concurrency/crash discipline — committed-only fold, staged
    tmp + atomic rename, tombstone-then-deferred-delete, and
    dropDuplicates self-healing of any crash-window duplicate rows.
    ``retired_ids`` deletes vectors from the index (the GDPR/unlearn
    path: the next generation simply omits their codes). Serving cost
    after the fold: a search opens nprobe directories of ONE
    generation instead of nprobe × n_batches."""
    from .ingest import compact_partition_dir

    return compact_partition_dir(
        spark,
        lake_root,
        id_col,
        retired_ids=retired_ids,
        id_col=id_col,
        target_files=target_files,
        partition_by="cluster",
    )
