"""File-level Bloom data skipping (sources/fileindex.py): point
lookups must equal the full-scan filter (no false negatives — a file
holding the key is never skipped), actually skip files on a clustered
layout, and stay CORRECT when files arrive after the index was built
(stale index degrades to slower, never to silent misses)."""

from __future__ import annotations

import glob
import os
import shutil

import pyspark.sql.functions as F

from ark_invest_api_rust_data_spark.sources.fileindex import (
    bloom_skip_files,
    build_bloom_file_index,
    read_point_lookup,
)


def _write_clustered(spark, path: str, n_rows: int = 4000, n_files: int = 8):
    """Key-clustered dataset: range-partitioned on the key so each file
    holds a disjoint key band (the layout where skipping pays)."""
    df = spark.range(n_rows).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("v")
    )
    df.repartitionByRange(n_files, "k").write.mode("overwrite").parquet(path)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_point_lookup_equals_full_scan(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write_clustered(spark, path)
    build_bloom_file_index(spark, path, "k")
    full = spark.read.parquet(path)
    for key in [0, 17, 1999, 3999]:
        assert _rows(read_point_lookup(spark, path, "k", key)) == _rows(
            full.filter(F.col("k") == key)
        )
    # absent keys: empty, schema preserved
    miss = read_point_lookup(spark, path, "k", 999_999)
    assert miss.count() == 0
    assert miss.columns == full.columns


def test_point_lookup_skips_files_on_clustered_layout(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write_clustered(spark, path)
    build_bloom_file_index(spark, path, "k")
    scan, skipped = bloom_skip_files(spark, path, "k", 17)
    assert skipped, "clustered layout must allow skipping"
    assert len(scan) < len(scan) + len(skipped)
    # the scanned subset still contains the key's file
    got = read_point_lookup(spark, path, "k", 17)
    assert got.count() == 1


def test_stale_index_scans_unindexed_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write_clustered(spark, path)
    build_bloom_file_index(spark, path, "k")
    # a new file lands AFTER the index build, carrying a fresh key
    late = spark.createDataFrame([(1_000_000, 42)], "k long, v long")
    tmp = str(tmp_path / "late")
    late.coalesce(1).write.mode("overwrite").parquet(tmp)
    (src,) = glob.glob(f"{tmp}/part-*.parquet")
    shutil.copy(src, os.path.join(path, "late-000.parquet"))

    got = read_point_lookup(spark, path, "k", 1_000_000)
    assert _rows(got) == [(1_000_000, 42)]
    # and the unindexed file is in every scan list (never bloom-skipped)
    scan, _ = bloom_skip_files(spark, path, "k", 17)
    assert any(f.endswith("late-000.parquet") for f in scan)


def test_probe_uses_sidecar_params_not_caller_guess(spark, tmp_path):
    """Round-8 advisor fix: the sidecar persists (m_bits, k); probing
    must use THOSE (different values hash to different positions →
    false negatives → silently dropped rows). Default probe args follow
    the sidecar; explicitly mismatched args fail loudly."""
    import pytest

    path = str(tmp_path / "ds")
    _write_clustered(spark, path)
    # non-default build parameters
    build_bloom_file_index(spark, path, "k", m_bits=1 << 12, k=3)
    full = spark.read.parquet(path)
    # default (sidecar-derived) probe is exact
    for key in [3, 1234, 3999]:
        assert _rows(read_point_lookup(spark, path, "k", key)) == _rows(
            full.filter(F.col("k") == key)
        )
    # matching explicit params are accepted
    assert read_point_lookup(spark, path, "k", 3, m_bits=1 << 12, k=3).count() == 1
    # mismatched explicit params raise instead of silently missing rows
    with pytest.raises(ValueError, match="false negatives"):
        bloom_skip_files(spark, path, "k", 3, m_bits=1 << 16, k=3)
    with pytest.raises(ValueError, match="false negatives"):
        read_point_lookup(spark, path, "k", 3, m_bits=1 << 12, k=4)


def test_partitioned_layout_is_indexed_recursively(spark, tmp_path):
    """Round-8 advisor fix: hive-partitioned layouts put files in
    subdirectories; the listing must recurse so nested files are
    skippable (and never silently missed), and partition columns must
    survive the leaf-file read (basePath)."""
    path = str(tmp_path / "ds")
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 7 % 100).alias("v"),
    )
    df.repartitionByRange(4, "k").write.mode("overwrite").partitionBy(
        "p"
    ).parquet(path)
    build_bloom_file_index(spark, path, "k")
    full = spark.read.parquet(path)
    for key in [0, 501, 1999]:
        got = read_point_lookup(spark, path, "k", key)
        assert "p" in got.columns  # partition column resolved
        assert _rows(got.select("k", "v", "p")) == _rows(
            full.filter(F.col("k") == key).select("k", "v", "p")
        )
    scan, skipped = bloom_skip_files(spark, path, "k", 501)
    assert skipped, "nested clustered files must still be skippable"
    assert all(os.sep in os.path.relpath(f, path) for f in scan + skipped), (
        "listing must surface nested partition files"
    )


def test_sidecar_is_invisible_to_plain_readers(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write_clustered(spark, path, n_rows=500, n_files=2)
    before = _rows(spark.read.parquet(path))
    build_bloom_file_index(spark, path, "k")
    # underscore-prefixed sidecar: a vanilla read sees the same data
    assert _rows(spark.read.parquet(path)) == before
