"""Streaming corpus ingest with incremental near-dup dedup (B24×B29 —
the production loop a training-data pipeline actually runs: documents
arrive continuously, each must be near-dup-checked against EVERYTHING
seen before, and the signature index must grow with the stream).

Policy: FIRST-SEEN-CANONICAL. A new doc is dropped iff it is a
near-dup of (a) anything in the seed corpus, (b) anything streamed in
an earlier micro-batch, or (c) a smaller-id doc in its own micro-batch.
Bands of ALL ingested docs — kept or dropped — are appended to the
store, so "near-dup of a dropped dup" still drops (conservative: the
survivor set never contains a near-dup pair member whose canonical was
seen first; the alternative greedy-vs-kept policy can chain-admit
near-dups across batches). With arrivals ordered by doc id this is
EXACTLY the batch rule "drop d iff ∃ near-dup x with x seen-before d"
— the equivalence the test pins.

Layout under ``store_root`` (all idempotent per micro-batch —
overwrite into ``src=b<batch_id>`` partition dirs, so a post-crash
replay of batch N replaces rather than duplicates it):

* ``bands/src=corpus/`` — seed index (``seed_band_store``);
  ``bands/src=b<N>/`` — per-batch appends. The at-scale layout sorts
  each file by band_key (row-group pruning on probe).
* ``docs/src=b<N>/`` — every ingested doc + ``kept`` flag (the raw
  archive a real pipeline retains anyway; also the shingle source for
  verifying candidates against earlier non-corpus docs).

Shuffle shape per micro-batch: the batch side is micro-batch-sized
(narrow signature compute + band join probe of the store scan); the
store scan is the only corpus-sized input and never shuffles.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import band_table, incremental_near_dup_pairs


def seed_band_store(corpus: DataFrame, store_root: str, **lsh_kwargs) -> None:
    """Write the seed corpus band index (one-time; sorted by band_key
    so per-batch probes prune row groups)."""
    (
        band_table(corpus, **lsh_kwargs)
        .sortWithinPartitions("band_key")
        .write.mode("overwrite")
        .parquet(f"{store_root}/bands/src=corpus")
    )


def start_incremental_dedup_stream(
    spark: SparkSession,
    stream_docs: DataFrame,
    corpus: DataFrame,
    store_root: str,
    checkpoint: str,
    query_name: str = "incremental_dedup",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    available_now: bool = True,
    n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
):
    """Start the ingest-dedup stream. Requires ``seed_band_store`` to
    have been run for ``corpus`` under ``store_root`` **with the same
    LSH parameters** (n / num_hashes / rows_per_band) — band keys from
    different parameterizations never match, so a mismatch would
    silently admit every duplicate. Pass the kwargs to both."""
    lsh = dict(n=n, num_hashes=num_hashes, rows_per_band=rows_per_band)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)  # cut the source lineage;
        # the batch frame is consumed 4× below (pairs, flags, docs, bands)

        me = f"b{batch_id}"
        # CRASH-REPLAY SAFETY: a replay of batch N must not read the
        # crashed attempt's own src=bN partitions — they are both stale
        # input AND the overwrite target, and Spark's self-overwrite
        # check does not catch parent-dir reads feeding a child-dir
        # write (the job would delete its own input files mid-scan).
        # read_band_store also prunes RETIRED partitions (folded by a
        # previous compaction, pending deferred deletion) — pruned
        # partitions generate no scan tasks, so the next compaction can
        # delete them without failing this batch mid-flight.
        store = read_band_store(spark, store_root).filter(F.col("src") != me)
        docs_dir = f"{store_root}/docs"
        seen = corpus.select(F.col(id_col), F.col(text_col))
        if os.path.isdir(docs_dir):
            prev = (
                spark.read.parquet(docs_dir)
                .filter(F.col("src") != me)
                .select(F.col(id_col), F.col(text_col))
            )
            seen = seen.unionByName(prev)

        # collapse_exact: the streaming mega-bucket guard — a viral
        # batch of byte-identical docs (boilerplate floods are bursty
        # by nature) enters the band machinery as ONE representative
        # plus linear synthesized (canonical, clone, jc=1) pairs; the
        # drop set is provably identical (dedup.py docstring + pytest)
        pairs = incremental_near_dup_pairs(
            seen,
            batch,
            band_store=store,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            collapse_exact=True,
            **lsh,
        )
        # classify pair sides: batch-vs-seen → drop the batch side;
        # batch-vs-batch → drop the larger id (first-seen-canonical)
        b_ids = batch.select(F.col(id_col).alias("_bid"))
        flagged = (
            pairs.join(
                b_ids.select(F.col("_bid").alias("doc_a"), F.lit(True).alias("_a_new")),
                "doc_a",
                "left",
            )
            .join(
                b_ids.select(F.col("_bid").alias("doc_b"), F.lit(True).alias("_b_new")),
                "doc_b",
                "left",
            )
            .select(
                "doc_a",
                "doc_b",
                F.coalesce("_a_new", F.lit(False)).alias("_a_new"),
                F.coalesce("_b_new", F.lit(False)).alias("_b_new"),
            )
        )
        drop_ids = (
            flagged.filter(F.col("_b_new")).select(F.col("doc_b").alias(id_col))
            .union(
                flagged.filter(F.col("_a_new") & ~F.col("_b_new")).select(
                    F.col("doc_a").alias(id_col)
                )
            )
            .distinct()
        )
        out = batch.join(drop_ids, id_col, "left_anti").withColumn(
            "kept", F.lit(True)
        ).unionByName(
            batch.join(drop_ids, id_col, "left_semi").withColumn("kept", F.lit(False))
        )
        # BATCH-ID REUSE SAFETY: a stream restarted with a FRESH
        # checkpoint restarts batch ids at b0. If a past compaction
        # tombstoned src=b0, this batch's overwrite would succeed but
        # read_band_store would keep pruning it and the next compaction
        # would delete it — new data silently invisible, then destroyed.
        # Un-tombstone our own src BEFORE the rewrite (r9 advisor):
        # unretiring after left a window where a concurrent
        # compaction's deferred delete could rmtree the freshly
        # rewritten partition and the late unretire would then mark a
        # deleted partition live. With unretire-first, any compaction
        # that reads the tombstones after this point spares the
        # partition; one that read them before is caught by
        # compact_partition_dir's rewrite-detection mtime guard.
        _unretire(store_root, me)
        # idempotent per-batch writes: replays overwrite in place
        out.write.mode("overwrite").parquet(f"{docs_dir}/src={me}")
        (
            band_table(batch, id_col=id_col, text_col=text_col, **lsh)
            .sortWithinPartitions("band_key")
            .write.mode("overwrite")
            .parquet(f"{store_root}/bands/src={me}")
        )

    writer = (
        stream_docs.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

def band_store_srcs(store_root: str) -> list[str]:
    """Partition values physically present under ``bands/`` (e.g.
    ``corpus``, ``b0``, ``compact_g1``) — including RETIRED partitions
    awaiting deferred deletion; see ``read_band_store`` for the live
    view probes should use."""
    return partition_srcs(f"{store_root}/bands")


def partition_srcs(base: str) -> list[str]:
    """``src=`` partition values physically under ``base`` (generic —
    any append-per-micro-batch store: bands, semantic assignments,
    vector archives)."""
    if not os.path.isdir(base):
        return []
    return sorted(
        d[len("src=") :] for d in os.listdir(base) if d.startswith("src=")
    )


_RETIRED_MARKER = ".retired.json"


def retired_band_srcs(store_root: str) -> list[str]:
    """Srcs folded into a compacted generation by the LAST compaction
    and kept on disk as tombstones (deleted by the NEXT compaction)."""
    return retired_srcs(f"{store_root}/bands")


def retired_srcs(base: str) -> list[str]:
    path = f"{base}/{_RETIRED_MARKER}"
    try:
        with open(path) as f:
            import json

            return list(json.load(f).get("retired", []))
    except (OSError, ValueError):
        return []


def _write_retired_at(base: str, srcs: list[str]) -> None:
    import json

    tmp = f"{base}/{_RETIRED_MARKER}.tmp"
    with open(tmp, "w") as f:
        json.dump({"retired": sorted(srcs)}, f)
    os.replace(tmp, f"{base}/{_RETIRED_MARKER}")  # atomic on POSIX


def _write_retired(store_root: str, srcs: list[str]) -> None:
    _write_retired_at(f"{store_root}/bands", srcs)


def unretire_src(base: str, src: str) -> None:
    """Remove ``src`` from ``base``'s tombstone set if present — called
    after a per-batch write so a partition re-created under a reused
    batch id (fresh-checkpoint restart) is live again instead of being
    pruned by every reader and destroyed by the next compaction."""
    retired = retired_srcs(base)
    if src in retired:
        _write_retired_at(base, [s for s in retired if s != src])


def _unretire(store_root: str, src: str) -> None:
    unretire_src(f"{store_root}/bands", src)


def read_live_partitions(spark: SparkSession, base: str) -> DataFrame:
    """The LIVE view of a ``src=``-partitioned store: everything except
    retired tombstones (a partition-pruning predicate — pruned
    partitions produce no scan tasks, which is what makes the deferred
    delete in the next compaction safe under a running stream)."""
    df = spark.read.parquet(base)
    retired = retired_srcs(base)
    if retired:
        df = df.filter(~F.col("src").isin(retired))
    return df


def compact_partition_dir(
    spark: SparkSession,
    base: str,
    sort_col: str,
    retired_ids: DataFrame | None = None,
    id_col: str | None = None,
    target_files: int | None = None,
    dedup: bool = True,
    partition_by: str | None = None,
) -> dict:
    """Generic fold of a ``src=``-partitioned append store into ONE
    ``sort_col``-range-partitioned, within-file-sorted generation,
    with the full concurrency/crash discipline compact_band_store
    documents (committed-only fold, staged tmp + atomic rename,
    tombstone-then-deferred-delete, duplicate-row self-healing).
    ``retired_ids`` (with ``id_col``) drops deleted entities from the
    folded generation. ``partition_by`` switches the generation's
    layout from range-by-sort_col to HIVE partitioning on that column
    (hash-clustered writers, within-file sort on sort_col) — for
    stores whose readers prune on a partition predicate rather than
    footer ranges (the ANN code lake's ``cluster=`` dirs,
    streaming/ann_ingest.compact_code_lake). Returns {"generation",
    "folded", "deleted", "rows"}."""
    import shutil

    all_srcs = partition_srcs(base)
    if not all_srcs:
        raise FileNotFoundError(f"no partition store under {base}")
    prev_retired = retired_srcs(base)
    # Rewrite-detection guard (r9 advisor): a batch-id-reuse replay may
    # have rewritten a retired src AFTER it was tombstoned (the
    # unretire-first ordering in the writers shrinks but cannot close
    # the window — this compaction may have been listed before the
    # unretire landed). A retired dir whose mtime is newer than the
    # tombstone file was rewritten with live data: skip the delete and
    # leave it out of this fold; the fresh tombstone set written below
    # no longer contains it, so it is live again afterward (any
    # duplicate rows vs an earlier generation heal on the next fold's
    # dropDuplicates).
    try:
        tomb_mtime = os.path.getmtime(f"{base}/{_RETIRED_MARKER}")
    except OSError:
        tomb_mtime = float("inf")
    deleted = []
    for s in prev_retired:
        d = f"{base}/src={s}"
        try:
            if os.path.getmtime(d) > tomb_mtime:
                continue  # rewritten after retirement — live data
        except OSError:
            pass  # already gone: rmtree below is a no-op
        shutil.rmtree(d, ignore_errors=True)
        deleted.append(s)
    srcs = [
        s
        for s in all_srcs
        if s not in prev_retired and os.path.exists(f"{base}/src={s}/_SUCCESS")
    ]
    if not srcs:
        raise FileNotFoundError(f"no committed partitions under {base}")
    gen = 1 + max(
        (int(s[len("compact_g") :]) for s in all_srcs if s.startswith("compact_g")),
        default=0,
    )
    tmp = f"{base}/.compact_tmp"
    # basePath pins partition discovery to ONE root so stores with
    # nested hive partitions under each src= (the ANN code lake's
    # cluster= dirs) resolve consistently across the selected roots
    df = (
        spark.read.option("basePath", base)
        .parquet(*[f"{base}/src={s}" for s in srcs])
        .drop("src")
    )
    if dedup:
        df = df.dropDuplicates()
    if retired_ids is not None:
        if id_col is None:
            raise ValueError("retired_ids requires id_col")
        df = df.join(retired_ids.select(id_col).distinct(), id_col, "left_anti")
    n_files = target_files or max(
        1, spark.sparkContext.defaultParallelism // 4
    )
    if partition_by is None:
        writer = (
            df.repartitionByRange(n_files, sort_col)
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
        )
    else:
        # hash-cluster writers on the hive key so each partition dir
        # gets few large files, not one per task
        writer = (
            df.repartition(n_files, partition_by)
            .sortWithinPartitions(partition_by, sort_col)
            .write.mode("overwrite")
            # static per-write: the staged generation must carry the
            # _SUCCESS marker the committed-only fold checks, even if
            # some earlier code set the session to dynamic overwrite
            .option("partitionOverwriteMode", "static")
            .partitionBy(partition_by)
        )
    writer.parquet(tmp)
    n_rows = spark.read.parquet(tmp).count()
    os.rename(tmp, f"{base}/src=compact_g{gen}")
    _write_retired_at(base, srcs)
    return {"generation": gen, "folded": srcs, "deleted": deleted, "rows": n_rows}


def read_band_store(spark: SparkSession, store_root: str) -> DataFrame:
    """The LIVE band store: every ``src=`` partition except retired
    tombstones. The retired filter is a partition-pruning predicate —
    pruned partitions produce no scan tasks, so their files are never
    opened, which is what makes the deferred delete in the next
    ``compact_band_store`` safe under a running ingest stream.

    CRASH-WINDOW CAVEAT (duplicate rows, never lost rows): a
    fresh-checkpoint stream un-tombstones its own ``src=`` partition
    BEFORE overwriting it (see ``near_dup_ingest_stream``). If the
    driver dies between the unretire and the overwrite, a still-on-disk
    tombstoned partition whose rows were already folded into a compact
    generation is resurrected as live, so this view double-counts its
    rows until either the stream's replay completes the overwrite or
    the next ``compact_band_store`` fold drops the duplicates
    (``dropDuplicates`` over the band columns). Band-store consumers
    join on (band_key, doc) equality, so duplicate band rows can only
    re-propose already-proposed candidate pairs — never change a
    verdict."""
    return read_live_partitions(spark, f"{store_root}/bands")


def compact_band_store(
    spark: SparkSession,
    store_root: str,
    retired_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    target_files: int | None = None,
) -> dict:
    """Band-store lifecycle (the vacuum_versions analog for the LSH
    index): merge the accumulated per-batch ``src=`` partitions —
    which grow one small sorted file per micro-batch forever — into
    ONE band_key-range-partitioned, within-file-sorted generation, and
    drop bands of ``retired_ids`` (docs deleted from the corpus).
    Probe cost stays flat because the probe join's input is the same
    rows in fewer, better-clustered files (range partitioning by
    band_key means a given band key lives in exactly one file, so a
    footer-stats-pruned probe touches one file instead of every
    per-batch file).

    Safe to run CONCURRENTLY with the ingest stream:

    * only partitions carrying Spark's ``_SUCCESS`` commit marker are
      folded — an in-flight batch's partial partition is invisible to
      the compaction scan and untouched;
    * deletion is DEFERRED one compaction cycle. Folding records the
      folded srcs as tombstones in ``bands/.retired.json`` (atomic
      ``os.replace``) and leaves their files on disk; the NEXT
      compaction deletes them. ``read_band_store`` prunes retired
      partitions, so every batch started after the fold generates no
      scan tasks against them — the delayed delete can never yank a
      file out from under a live probe scan. (The one documented
      requirement: no single micro-batch may span an entire
      compaction-to-compaction interval — a batch that listed a
      partition before it was retired must finish before the NEXT
      compaction deletes it. Compaction cadence is hours, micro-batches
      are seconds-to-minutes.)
    * the ingest stream's unretire-before-overwrite (batch-id reuse
      safety) opens one small crash window: a driver death between
      the unretire and the overwrite resurrects an already-folded
      partition as live, duplicating its rows in ``read_band_store``
      until the stream replay overwrites it or this fold's
      ``dropDuplicates`` heals them — duplicates only ever re-propose
      candidate pairs, they cannot change a dedup verdict.

    CRASH-SAFE by construction:

    * the merged output is staged under ``bands/.compact_tmp`` — a
      dot-prefixed dir Spark's partition discovery ignores — then
      atomically renamed to ``bands/src=compact_g<N>``;
    * a crash between the rename and the tombstone write leaves the
      folded partitions live NEXT TO the new generation — duplicate
      band rows, which are correctness-neutral (candidate pairs are
      deduped downstream) and self-healing: the next compaction folds
      both copies and ``dropDuplicates`` collapses them;
    * stream replay across the boundary is equivalent: a replayed
      batch's own bands inside the compacted generation add only
      batch×batch candidate pairs the batch self-join produces anyway
      (pytest-pinned in tests/test_streaming.py).

    Returns {"generation", "folded", "deleted", "rows"}.

    (Round 9: the mechanics — committed-only fold, staged tmp +
    atomic rename, tombstone-then-deferred-delete, duplicate-row
    self-heal — are the generic ``compact_partition_dir``, shared with
    the semantic store's compaction.)
    """
    return compact_partition_dir(
        spark,
        f"{store_root}/bands",
        "band_key",
        retired_ids=retired_ids,
        id_col=id_col,
        target_files=target_files,
    )
