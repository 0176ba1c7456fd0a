"""Parquet cache store (SURVEY.md §2 S1/S2) — two layouts.

Compat layout (reference parity): ONE ``{root}/{TICKER}.parquet`` FILE
per ticker (/root/reference/src/util.rs:92-95,100-108) — the companion
REST API reads that exact path, so the writer produces a single file
via coalesce(1) into a temp dir + atomic rename.

Lake layout (100 TB posture): hive-partitioned
``{root}/holdings/ticker=X/date=D/``. Partition pruning turns
per-ticker/per-date queries into narrow scans; incremental merges
rewrite only affected date partitions (dynamic partition overwrite)
instead of the whole history.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..session import tune


def read_ticker(spark: SparkSession, root: str, ticker: str) -> DataFrame | None:
    """S1 — lazy per-ticker cache scan; None if no cache (bootstrap)."""
    tune(spark)
    path = f"{root}/{ticker}.parquet"
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def write_ticker(df: DataFrame, root: str, ticker: str) -> str:
    """S2 — overwrite the single-file cache. coalesce(1) is correct
    here by design: per-ticker frames are ~10⁴–10⁵ rows (BASELINE.md);
    the lake layout below is the path for anything bigger."""
    os.makedirs(root, exist_ok=True)
    final = f"{root}/{ticker}.parquet"
    tmp = tempfile.mkdtemp(prefix=f".{ticker}_", dir=root)
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.replace(part, final)  # atomic on same filesystem
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def write_lake(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
    partition_cols: tuple[str, ...] = ("ticker", "date"),
) -> str:
    """Scale sink: hive-partitioned by (ticker, date) by default. With
    ``partitionOverwriteMode=dynamic`` an incremental merge rewrites
    only the date partitions present in ``df``."""
    path = f"{root}/holdings"
    (
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        if hasattr(df, "sparkSession")
        else None
    )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return path


def read_lake(spark: SparkSession, root: str) -> DataFrame:
    tune(spark)
    return spark.read.parquet(f"{root}/holdings")


def write_lake_bucketed_by_cusip(
    df: DataFrame, table: str = "holdings_by_cusip", num_buckets: int = 32
) -> None:
    """Security-centric lake variant: holdings bucketed by ``cusip``
    and sorted by (cusip, date) — the layout for cross-fund
    security-level analytics (which funds hold X, position history of
    X), where the ticker=/date= hive layout is exactly wrong (a
    per-security query would touch EVERY partition).

    Bucketing pays the cusip shuffle once at write time; after that:
    * cusip⋈cusip joins (holdings against a securities dim bucketed
      the same way) plan with NO Exchange on either side, and
    * a single-security filter prunes to 1/num_buckets of the files
      (``SelectedBucketsCount`` in the scan node) before any IO.

    Kept as a *secondary* copy next to the hive lake — at 100 TB the
    two layouts serve disjoint query families, and storage is cheaper
    than the per-query shuffle this removes."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "cusip")
        .sortBy("cusip", "date")
        .saveAsTable(table)
    )


def security_history(spark: SparkSession, cusip: str, table: str = "holdings_by_cusip") -> DataFrame:
    """Cross-fund position history of one security from the bucketed
    lake: bucket pruning reads only the one bucket that can contain
    the cusip (SelectedBucketsCount: 1 out of N in the scan).

    Spark's auto-bucketed-scan heuristic disables bucketed reading for
    filter-only plans (it only considers shuffle elision, not pruning),
    which would silently scan every file — pin it off so the scan stays
    bucketed and the equality filter prunes."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return (
        spark.table(table)
        .filter(F.col("cusip") == cusip)
        .orderBy("date", "ticker")
    )


def compact_lake(
    spark: SparkSession, root: str, max_records_per_file: int = 5_000_000
) -> int:
    """Compact the hive-partitioned holdings lake in place.

    Incremental merges with dynamic partition overwrite accumulate one
    small file per merge per touched partition; at warehouse scale the
    file count (not data size) becomes the scan bottleneck. This
    rewrites every partition through a shuffle-free coalescing pass:
    read → write with maxRecordsPerFile, partition layout preserved.

    Rows are sorted by (ticker, date, cusip) WITHIN each task before
    the partitioned write — still narrow (no shuffle: partitionBy
    splits each task's run into per-partition files, and the sort
    makes every written file cusip-ordered). Row order is load-bearing
    at scale twice over: ordered files compress better AND parquet
    row-group min/max stats on cusip become selective, so
    security-centric point reads prune row groups, not just partition
    dirs (measured in SCALE.md finding 4: random layout inflated
    downstream shuffle bytes ~2.4×).

    Crash safety: the rewrite lands in a SIBLING directory and is
    swapped in only on success (old data kept as ``holdings_pre_compact``
    until the swap completes) — an in-place dynamic overwrite has a
    commit window where a crash after partitions are deleted loses data
    with no backup. Returns the number of files after compaction."""
    import glob as _glob

    path = f"{root}/holdings"
    staged = f"{root}/.holdings_compacting"
    backup = f"{root}/holdings_pre_compact"
    shutil.rmtree(staged, ignore_errors=True)
    df = spark.read.parquet(path)
    (
        df.sortWithinPartitions("ticker", "date", "cusip")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("ticker", "date")
        .parquet(staged)
    )
    # both renames are metadata-only on the same filesystem; the data
    # is never in a partially-deleted state
    shutil.rmtree(backup, ignore_errors=True)
    os.replace(path, backup)
    os.replace(staged, path)
    shutil.rmtree(backup, ignore_errors=True)
    return len(_glob.glob(f"{path}/*/*/*.parquet"))
