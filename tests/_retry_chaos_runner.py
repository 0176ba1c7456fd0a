#!/usr/bin/env python
"""Subprocess runner for the task-retry idempotence chaos test
(VERDICT r4 #4). Runs in its OWN SparkSession because local-mode task
retries require the ``local[N, maxFailures]`` master form, which the
shared session fixture doesn't use (and can't be changed post-start).

Injects task failures with a test-only mapInPandas stage that raises
on ``TaskContext.attemptNumber() == 0`` (every task of the wrapped
stage fails once, then succeeds on retry — exactly the routine
lost-executor retry at 1000-executor scale), spliced into:

* the ingest-dedup stream's band/pairs stages (patched module globals
  ``band_table`` / ``incremental_near_dup_pairs``), so the docs/bands
  parquet WRITE jobs themselves run with retried upstream tasks,
  followed by a band-store compaction;
* the SCD2 merge (patched ``scd2_apply``), so every versioned dim
  write runs with retried tasks.

Each scenario runs twice — clean and with injection — into separate
store roots; the runner prints one JSON line with the comparison and
the count of injected failures (proven > 0 via marker files written by
the failing attempts). Exit 0 iff stores are identical and failures
actually fired.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import ark_invest_api_rust_data_spark.streaming.ingest as ing  # noqa: E402
import ark_invest_api_rust_data_spark.streaming.scd2 as s2  # noqa: E402
from ark_invest_api_rust_data_spark.operators.dedup import (  # noqa: E402
    band_table,
    incremental_near_dup_pairs,
)
from ark_invest_api_rust_data_spark.operators.merge import scd2_apply  # noqa: E402
from ark_invest_api_rust_data_spark.session import get_spark  # noqa: E402


def make_flaky(marker_dir: str):
    """Wrap a DataFrame with a stage whose every task fails on its
    first attempt (writing a marker file first, so the test can prove
    failures actually fired) and passes data through unchanged on
    retry."""

    def flaky(df):
        def gen(batches):
            from pyspark import TaskContext

            tc = TaskContext.get()
            if tc is not None and tc.attemptNumber() == 0:
                marker = os.path.join(
                    marker_dir, f"fail-{tc.stageId()}-{tc.partitionId()}"
                )
                with open(marker, "w"):
                    pass
                raise RuntimeError("injected chaos: first attempt always fails")
            yield from batches

        return df.mapInPandas(gen, df.schema)

    return flaky


def run_ingest(spark, docs, tmp: str, inject: bool, flaky):
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    streamed = sorted(
        docs.filter(F.col("doc_id") % 10 >= 8).collect(), key=lambda r: r["doc_id"]
    )
    k = len(streamed) // 2
    tag = "chaos" if inject else "clean"
    src = f"{tmp}/arrivals_{tag}"
    os.makedirs(src)
    for i, chunk in enumerate([streamed[:k], streamed[k:]]):
        p = f"{src}/part{i}.parquet"
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_000_000 + i, 1_000_000 + i))

    store_root = f"{tmp}/store_{tag}"
    orig_bt, orig_pairs = ing.band_table, ing.incremental_near_dup_pairs
    if inject:
        ing.band_table = lambda *a, **kw: flaky(band_table(*a, **kw))
        ing.incremental_near_dup_pairs = lambda *a, **kw: flaky(
            incremental_near_dup_pairs(*a, **kw)
        )
    try:
        ing.seed_band_store(corpus, store_root)
        stream_in = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/part*.parquet")
        )
        q = ing.start_incremental_dedup_stream(
            spark, stream_in, corpus, store_root,
            checkpoint=f"{tmp}/ckpt_{tag}", threshold=0.5,
        )
        q.awaitTermination()
        ing.compact_band_store(spark, store_root)
    finally:
        ing.band_table, ing.incremental_near_dup_pairs = orig_bt, orig_pairs

    bands = sorted(
        map(tuple, ing.read_band_store(spark, store_root).drop("src").collect())
    )
    docs_rows = sorted(
        map(tuple, spark.read.parquet(f"{store_root}/docs").drop("src").collect())
    )
    return bands, docs_rows


D = datetime.date
UPD_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("effective", T.DateType()),
    ]
)
DIM_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("valid_from", T.DateType()),
        T.StructField("valid_to", T.DateType()),
    ]
)
SCD2_BATCHES = [
    [(1, "a2", D(2024, 2, 1)), (2, "b", D(2024, 2, 1)), (9, "z", D(2024, 2, 1))],
    [(1, "a3", D(2024, 2, 15)), (1, "a4", D(2024, 3, 1)), (9, "z2", D(2024, 3, 1))],
]


def run_scd2(spark, tmp: str, inject: bool, flaky):
    tag = "chaos" if inject else "clean"
    root = f"{tmp}/scd2_{tag}"
    seed = spark.createDataFrame(
        [
            (1, "a", D(2024, 1, 1), None),
            (2, "b", D(2024, 1, 1), None),
            (3, "c", D(2024, 1, 1), None),
        ],
        DIM_SCHEMA,
    )
    orig = s2.scd2_apply
    if inject:
        s2.scd2_apply = lambda *a, **kw: flaky(scd2_apply(*a, **kw))
    try:
        s2.seed_dim(seed, root)
        for i, rows in enumerate(SCD2_BATCHES):
            s2.apply_scd2_batch(
                spark, spark.createDataFrame(rows, UPD_SCHEMA), i, root,
                "k", ["attr"],
            )
    finally:
        s2.scd2_apply = orig
    return sorted(map(tuple, s2.current_dim(spark, root).collect()))


def main() -> int:
    tmp = sys.argv[1]
    marker_dir = f"{tmp}/markers"
    os.makedirs(marker_dir, exist_ok=True)
    flaky = make_flaky(marker_dir)
    # local[4, 3]: 4 threads, tasks may fail up to 3 times — the only
    # way local mode executes task retries at all
    spark = get_spark(app_name="retry_chaos", master="local[4, 3]",
                      shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    clean_bands, clean_docs = run_ingest(spark, docs, tmp, inject=False, flaky=flaky)
    n_before = len(os.listdir(marker_dir))
    chaos_bands, chaos_docs = run_ingest(spark, docs, tmp, inject=True, flaky=flaky)
    n_ingest_failures = len(os.listdir(marker_dir)) - n_before

    clean_dim = run_scd2(spark, tmp, inject=False, flaky=flaky)
    n_before = len(os.listdir(marker_dir))
    chaos_dim = run_scd2(spark, tmp, inject=True, flaky=flaky)
    n_scd2_failures = len(os.listdir(marker_dir)) - n_before

    result = {
        "ingest_bands_identical": clean_bands == chaos_bands,
        "ingest_docs_identical": clean_docs == chaos_docs,
        "scd2_dim_identical": clean_dim == chaos_dim,
        "n_ingest_failures": n_ingest_failures,
        "n_scd2_failures": n_scd2_failures,
        "n_band_rows": len(clean_bands),
        "n_doc_rows": len(clean_docs),
        "n_dim_rows": len(clean_dim),
    }
    print(json.dumps(result))
    ok = (
        result["ingest_bands_identical"]
        and result["ingest_docs_identical"]
        and result["scd2_dim_identical"]
        and n_ingest_failures > 0
        and n_scd2_failures > 0
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
