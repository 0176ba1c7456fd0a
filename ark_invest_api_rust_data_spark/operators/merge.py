"""Union / dedupe / sort / incremental merge (SURVEY.md §2 U1–U5).

The reference's merge loop (/root/reference/src/util.rs:56-79,133-145):
cache ∪ fetch(≥ watermark) → normalize both → concat → dedupe-keep-
first → (backfill path only) sort → overwrite. On Spark:

* U1 concat        → ``unionByName`` (both sides pre-normalized to the
                     identical canonical schema — same invariant).
* U2 dedupe        → full-row ``dropDuplicates()``: keep-first equals
                     keep-any under full-row equality (kept row is
                     value-identical); subset-key keep-first for the
                     extension surface lives in dedup.py (B28).
* U3 sort          → date asc / weight desc with Polars' nulls-first
                     default pinned explicitly.
* U4 watermark     → ``max(date)`` — tiny agg action, then pushed into
                     the source fetch (query-param predicate pushdown).
* U5 merge         → composition below; idempotent because normalize is
                     idempotent and re-applied to both branches.

At 100 TB the dedupe is the only shuffle; it hashes the full row which
AQE handles fine, and the lake layout (ticker=/date= partitions,
parquet_store.py) means each incremental merge touches only the
affected date partitions rather than the whole history.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .adapters import DataSource
from .normalize import normalize


def concat_dedupe(dfs: list[DataFrame]) -> DataFrame:
    """U1+U2 — concat N canonical frames, drop exact-duplicate rows."""
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other, allowMissingColumns=False)
    return out.dropDuplicates()


def canonical_sort(df: DataFrame) -> DataFrame:
    """U3 — date asc, weight desc; Polars sort(nulls_last=false) puts
    nulls first on both keys (/root/reference/src/util.rs:126-131)."""
    return df.orderBy(F.asc_nulls_first("date"), F.desc_nulls_first("weight"))


def watermark(df: DataFrame, col: str = "date") -> datetime.date | None:
    """U4 — max(date) of the cache; drives incremental fetch pushdown."""
    row = df.agg(F.max(col).alias("m")).first()
    return row["m"] if row else None


def incremental_merge(
    cache: DataFrame | None,
    update: DataFrame,
    source: DataSource | None = None,
) -> DataFrame:
    """U5 — normalize both branches, concat, dedupe. ``cache=None`` is
    the bootstrap path (no merge, util.rs:76-78)."""
    fresh = normalize(update, source)
    if cache is None:
        return fresh
    return concat_dedupe([normalize(cache), fresh])
