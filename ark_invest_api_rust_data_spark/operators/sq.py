"""Scalar quantization (SQ8) — the uniform-grid compressed-vector ANN
tier (the ScalarQuantizer/QT_8bit design popularized by FAISS): each
dimension is independently mapped to an 8-bit code on a per-dimension
[min, max] grid learned from the corpus, and queries are answered by
asymmetric distance against the code midpoints.

Where it sits in the family (operators/similarity.py, operators/pq.py):
SQ8 is the cheap-training compression tier — no k-means, just one
min/max aggregation pass — at 8 bits/dim vs PQ's ~1 bit/dim but with
far lower distortion; at 100 TB it cuts the similarity scan's bytes
8× (64-dim float64 → 64 bytes) while keeping training a single
aggregation no matter the corpus size.

Determinism contract (why this oracle-matches bit-for-bit): vectors
enter on the μ-quantized int64 grid (floor(x·1e6), the
clustering/pq convention), per-dim min/max are EXACT int aggregates,
and both the encoder ``c = min(255, ((q-mn)·256) div (mx-mn))`` (the
clamp catches only q == mx) and the midpoint decoder
``mn + ((2c+1)·(mx-mn)) div 512`` are pure int64 arithmetic — the ADC
distance is an int64 sum of squared int diffs (≤ ~1e15 for 64 dims on
this grid, no overflow), so there is NO float fold anywhere and
summation order is irrelevant. Integer division is expressed as
``(a - pmod(a,b))/b`` because a double ``floor(a/b)`` can round across
an integer boundary; DuckDB mirrors it with ``//``.

Driver crossings (bounded by design): the 2·dim min/max row and the
first row's dimensionality — the model IS driver-sized, like PQ's
codebooks (pq.py:255)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MU = 1_000_000  # μ-quantization grid, matches clustering/pq


def _quantize(vec: Column) -> Column:
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(MU))).cast("long")
    )


def _intdiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative int64 operands: a double
    `floor(a/b)` can round up across an integer boundary; (a - a%b)/b
    is exact because the numerator is an exact multiple of b."""
    return ((a - F.pmod(a, b)) / b).cast("long")


class SqModel:
    """Trained SQ8: per-dim grid bounds ON THE μ GRID (int64 lists)
    plus the codes table ``(id_col, codes: array<smallint-range int>)``."""

    def __init__(self, mins: list[int], maxs: list[int], codes: DataFrame, id_col: str):
        self.mins = mins
        self.maxs = maxs
        self.codes = codes
        self.id_col = id_col

    @property
    def dim(self) -> int:
        return len(self.mins)


def sq_train(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> SqModel:
    """Learn the per-dimension grid (one exact min/max aggregation —
    the entire training cost) and encode the corpus to 8-bit codes in
    a narrow scan. Constant-dimension columns (mx == mn) encode to
    code 0 and decode back to exactly mn."""
    from .dedup import _spread

    q = _spread(df).select(id_col, _quantize(F.col(vec_col)).alias("_q"))
    dim = df.select(F.size(vec_col).alias("d")).first()["d"]
    row = q.agg(
        *[
            agg(F.element_at("_q", d + 1)).alias(f"_{nm}{d}")
            for d in range(dim)
            for nm, agg in (("mn", F.min), ("mx", F.max))
        ]
    ).first()  # bounded driver crossing: 2·dim ints
    mins = [row[f"_mn{d}"] for d in range(dim)]
    maxs = [row[f"_mx{d}"] for d in range(dim)]
    mn_arr = F.array(*[F.lit(int(v)).cast("long") for v in mins])
    mx_arr = F.array(*[F.lit(int(v)).cast("long") for v in maxs])
    codes = q.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: F.when(
                F.element_at(mx_arr, d) == F.element_at(mn_arr, d),
                F.lit(0).cast("long"),
            ).otherwise(
                F.least(
                    F.lit(255).cast("long"),
                    _intdiv(
                        (F.element_at("_q", d) - F.element_at(mn_arr, d)) * 256,
                        F.element_at(mx_arr, d) - F.element_at(mn_arr, d),
                    ),
                )
            ),
        ).alias("codes"),
    )
    return SqModel(mins, maxs, codes, id_col)


def sq_adc_topk(model: SqModel, query: list[float], topk: int = 10) -> DataFrame:
    """Asymmetric top-k: the μ-quantized query against decoded code
    midpoints — an int64 fold over the codes array, no float scan.
    Returns (id_col, sq_dist) ordered (sq_dist, id) for determinism."""
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    if len(query) != model.dim:
        raise ValueError(f"query dim {len(query)} != model dim {model.dim}")
    qq = F.array(
        *[F.lit(int(math.floor(float(x) * MU))).cast("long") for x in query]
    )
    mn_arr = F.array(*[F.lit(int(v)).cast("long") for v in model.mins])
    mx_arr = F.array(*[F.lit(int(v)).cast("long") for v in model.maxs])

    def term(acc: Column, d: Column) -> Column:
        mn = F.element_at(mn_arr, d)
        rng = F.element_at(mx_arr, d) - mn
        # rng == 0 (constant dim): code is 0 and the midpoint IS mn —
        # guarded here because pmod(_, 0) would yield null
        decoded = F.when(rng == 0, mn).otherwise(
            mn
            + _intdiv((F.lit(2) * F.element_at("codes", d) + 1) * rng, F.lit(512))
        )
        diff = F.element_at(qq, d) - decoded
        return acc + diff * diff

    dist = F.aggregate(
        F.sequence(F.lit(1), F.lit(model.dim)), F.lit(0).cast("long"), term
    )
    return (
        model.codes.select(model.id_col, dist.alias("sq_dist"))
        .orderBy("sq_dist", model.id_col)
        .limit(topk)
    )
