#!/usr/bin/env python
"""Generate a larger scale factor from existing driver testdata by
replication with key remapping — for the SCALE.md audit one decade
above the largest shipped testdata (sf0.1 → sf1).

    python tools/make_sf.py [src_dir] [dst_dir] [copies]

Default: /root/testdata/sf0.1 → /tmp/testdata/sf1, 10 copies.

Replication preserves the WITHIN-copy structure every operator is
sensitive to (join fan-outs, per-user session shapes, planted near-dup
pairs, group cardinalities per key) while keeping copies DISJOINT so
output sizes scale linearly instead of quadratically:

* join keys get a per-copy offset (custkey/orderkey/suppkey/partkey/
  user_id/doc_id/vec_id), so every FK still lands in its own copy —
  join selectivity and per-key group sizes are exactly those of the
  source at 10× the rows.
* ``documents.text`` gets a per-copy token suffix (``tok`` →
  ``tok_c<k>``): within-copy shingle sets (and thus the planted
  near-dup pairs) are order-isomorphic to the source, while cross-copy
  Jaccard is 0 — dedup output grows 10×, not C(10,2)×.
* ``embeddings.embedding`` is cyclically rotated by the copy index:
  a coordinate permutation preserves all within-copy norms/angles
  exactly (the planted similarity structure), while cross-copy cosine
  decorrelates — near-dup pair counts stay linear.
* nation/region are fixed-size dims at every SF — copied as-is.

The raw parquet physical types are preserved (plain spark.read, no
catalog shims) so the generated directory exercises load_table exactly
like driver-generated testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ark_invest_api_rust_data_spark.session import get_spark  # noqa: E402

# key column → needs offset; per table: (offset_keys, n_output_files,
# sorted). `sorted` mirrors the SOURCE layout (driver testdata is
# key-ordered for every table EXCEPT lineitem, which is shuffled —
# verified by inversion counts); replicating the layout matters because
# row order drives shuffle-block compressibility, and the audit compares
# shuffle bytes across scales.
KEYED: dict[str, tuple[list[str], int, bool]] = {
    "customer": (["c_custkey"], 2, True),
    "supplier": (["s_suppkey"], 1, True),
    "part": (["p_partkey"], 1, True),
    "orders": (["o_orderkey", "o_custkey"], 4, True),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 8, False),
    "events": (["event_id", "user_id"], 4, True),
    "documents": (["doc_id"], 2, True),
    "embeddings": (["vec_id"], 2, True),
}
FIXED = ["region", "nation"]

# every key column, FK or PK, must shift by the span of the ENTITY it
# references — an FK offset by its own table's max instead of the
# referenced dimension's silently breaks cross-copy referential
# integrity whenever some dimension rows have no facts (e.g. customers
# without orders). Span source of truth: (table, pk_column).
KEY_ENTITY: dict[str, tuple[str, str]] = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    spark = get_spark(app_name="make_sf")

    for t in FIXED:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")

    # per-copy key offsets, computed ONCE from each entity's own table
    # so PKs and the FKs referencing them shift identically
    span: dict[str, int] = {}
    for k, (ref_t, ref_col) in KEY_ENTITY.items():
        if ref_col not in span:
            ref = spark.read.parquet(f"{src}/{ref_t}.parquet")
            span[ref_col] = int(ref.agg(F.max(F.col(ref_col))).first()[0]) + 1
        span[k] = span[ref_col]

    for t, (keys, n_files, key_sorted) in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        # loop-invariant: embedding dimensionality (one lookup, not one
        # job per copy)
        dim = len(df.select("embedding").first()[0]) if t == "embeddings" else 0
        parts = []
        for c in range(copies):
            cp = df
            for k in keys:
                cp = cp.withColumn(k, (F.col(k) + F.lit(c * span[k])).cast(df.schema[k].dataType))
            if t == "documents" and c > 0:
                # disjoint token vocabulary per copy; keep n_chars honest
                cp = cp.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda tok: F.concat(tok, F.lit(f"_c{c}")),
                        ),
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and c > 0:
                # cyclic coordinate rotation by c: within-copy geometry
                # preserved exactly, cross-copy cosine decorrelated
                rot = c % dim
                cp = cp.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", rot + 1, dim - rot),
                        F.slice("embedding", 1, rot),
                    ),
                )
            parts.append(cp)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        pk = keys[0]
        if key_sorted:
            out = out.repartitionByRange(n_files, F.col(pk)).sortWithinPartitions(pk)
        else:
            out = out.repartition(n_files)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: {copies}x -> {dst}/{t}.parquet ({n_files} files)")

    print("done")


if __name__ == "__main__":
    main()
