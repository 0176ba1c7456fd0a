"""File-level Bloom-filter data skipping for parquet datasets — the
point-lookup companion to the min/max-footer pruning the z-order layout
exploits (operators/zorder.py).

Parquet footers carry min/max stats, which prune RANGE predicates on
clustered columns but do nothing for high-cardinality point lookups on
columns the layout wasn't sorted by. A per-file Bloom sidecar fixes
that: ``build_bloom_file_index`` folds every file's key values into one
m-bit bitmap row (the same exact-integer hash family as
operators/sketch.bloom_build, so false positives only — a file
containing the key is NEVER skipped), and ``read_point_lookup`` scans
only the files whose bitmap claims the key (plus any file written after
the index — see staleness below).

Scale design (100 TB / 1000 executors):

* build is one scan: (file, key) → k bit positions → per-(file, word)
  bit-OR — map-side combined, shuffle bounded by n_files · m_bits/64
  words, never the data;
* the sidecar lives under ``<dir>/_bloom_index`` — the leading
  underscore makes every parquet/Hadoop reader ignore it, so the data
  directory stays a plain readable dataset;
* probing is distributed: the sidecar is read as a DataFrame and each
  bitmap tested JVM-side with ``bloom_contains`` against the literal
  key; only MATCHING FILE NAMES cross to the driver (at 1M files ×
  8 KiB bitmaps, collecting the sidecar itself would be GBs — the
  match list is bytes);
* staleness is handled, not assumed away: the sidecar records which
  files it indexed; files present in the directory but absent from the
  index (ingested after the build) are always scanned, so a stale
  index degrades to correct-but-slower, never to silent misses.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import _bit_masks, bloom_contains, hash_positions

INDEX_SUBDIR = "_bloom_index"


def _index_path(data_dir: str) -> str:
    return os.path.join(data_dir, INDEX_SUBDIR)


def build_bloom_file_index(
    spark: SparkSession,
    data_dir: str,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> str:
    """Build/replace the per-file Bloom sidecar for ``key_col``.
    Returns the sidecar path. One data scan; the sidecar is one row per
    file: (file, bitmap: array<long>, m_bits, k)."""
    n_words = (m_bits + 63) // 64
    keyed = spark.read.parquet(data_dir).select(
        F.input_file_name().alias("file"),
        F.col(key_col).cast("string").alias("_key"),
    )
    pos = keyed.select(
        "file", F.explode(hash_positions(F.col("_key"), k, m_bits)).alias("_pos")
    )
    words = (
        pos.select(
            "file",
            (F.col("_pos") / 64).cast("long").alias("_word"),
            F.element_at(
                _bit_masks(), (F.col("_pos") % 64).cast("int") + 1
            ).alias("_mask"),
        )
        .groupBy("file", "_word")
        .agg(F.bit_or("_mask").alias("_bits"))
    )
    index = (
        words.groupBy("file")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_word", "_bits"))
            ).alias("_m")
        )
        .select(
            "file",
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
                lambda i: F.coalesce(F.element_at("_m", i), F.lit(0).cast("long")),
            ).alias("bitmap"),
            F.lit(m_bits).alias("m_bits"),
            F.lit(k).alias("k"),
        )
    )
    index.write.mode("overwrite").parquet(_index_path(data_dir))
    return _index_path(data_dir)


def _data_files(data_dir: str) -> list[str]:
    """Data files currently in the directory, RELATIVE paths, recursing
    into partition subdirectories (``dt=.../part-*.parquet``). Hidden
    and metadata paths (any component starting with ``.`` or ``_`` —
    including the sidecar itself) are skipped, matching what
    ``spark.read.parquet(data_dir)`` would scan. Local FS listing; swap
    for the FileSystem API on an object store."""
    out: list[str] = []
    for root, dirs, files in os.walk(data_dir):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.relpath(os.path.join(root, f), data_dir))
    return sorted(out)


def _rel_to_dir(uri: str, data_dir: str) -> str:
    """Normalize an ``input_file_name`` URI to a path relative to
    ``data_dir`` so indexed files compare against the listing by FULL
    relative path (basenames alone could collide across partition
    directories)."""
    path = uri
    if path.startswith("file:"):
        path = path[len("file:"):]
        while path.startswith("//"):
            path = path[1:]
    path = os.path.abspath(path)
    return os.path.relpath(path, os.path.abspath(data_dir))


def _sidecar_params(
    index: DataFrame, m_bits: int | None, k: int | None
) -> tuple[int, int]:
    """The (m_bits, k) the sidecar was BUILT with — probing with any
    other values would compute different bit positions and produce
    false negatives (silently dropped rows). The stored values win;
    explicitly passed values must agree or we fail loudly."""
    params = index.select("m_bits", "k").distinct().collect()
    if len(params) != 1:
        raise ValueError(
            f"bloom sidecar has inconsistent (m_bits, k) rows: {params}"
        )
    stored_m, stored_k = int(params[0]["m_bits"]), int(params[0]["k"])
    if m_bits is not None and m_bits != stored_m:
        raise ValueError(
            f"bloom probe m_bits={m_bits} != sidecar m_bits={stored_m}; "
            "probing with mismatched parameters would yield false negatives"
        )
    if k is not None and k != stored_k:
        raise ValueError(
            f"bloom probe k={k} != sidecar k={stored_k}; "
            "probing with mismatched parameters would yield false negatives"
        )
    return stored_m, stored_k


def bloom_skip_files(
    spark: SparkSession,
    data_dir: str,
    key_col: str,
    value,
    m_bits: int | None = None,
    k: int | None = None,
) -> tuple[list[str], list[str]]:
    """(files to scan, files skipped) for a point lookup — the skip
    decision, exposed for tests and EXPLAIN-style tooling. Files newer
    than the index are always in the scan list. ``m_bits``/``k``
    default to the values persisted in the sidecar (the only ones that
    can be correct); passing different values raises."""
    index = spark.read.parquet(_index_path(data_dir))
    m_bits, k = _sidecar_params(index, m_bits, k)
    key = F.lit(str(value))
    matching = [
        r["file"]
        for r in index.filter(
            bloom_contains(key, F.col("bitmap"), m_bits, k)
        )
        .select("file")
        .collect()
    ]
    indexed = {
        _rel_to_dir(r["file"], data_dir)
        for r in index.select("file").collect()
    }
    match_names = {_rel_to_dir(f, data_dir) for f in matching}
    scan, skipped = [], []
    for name in _data_files(data_dir):
        if name in match_names or name not in indexed:
            scan.append(os.path.join(data_dir, name))
        else:
            skipped.append(os.path.join(data_dir, name))
    return scan, skipped


def read_point_lookup(
    spark: SparkSession,
    data_dir: str,
    key_col: str,
    value,
    m_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Rows with ``key_col == value``, scanning only files the Bloom
    sidecar cannot rule out (result provably equals the full-scan
    filter: Bloom membership has no false negatives, unindexed files
    are always scanned, and probe parameters come from the sidecar).
    ``basePath`` keeps hive-partition columns resolvable when the scan
    list is leaf files under partition subdirectories."""
    scan, _ = bloom_skip_files(spark, data_dir, key_col, value, m_bits, k)
    full = spark.read.parquet(data_dir)
    if not scan:
        return full.filter(F.lit(False))  # schema-preserving empty
    return (
        spark.read.schema(full.schema)
        .option("basePath", data_dir)
        .parquet(*scan)
        .filter(F.col(key_col) == F.lit(value))
    )
