"""SQ8 scalar quantization (operators/sq.py): grid training, code
bounds, integer-exact decode, and ADC search determinism."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ark_invest_api_rust_data_spark.operators.sq import (
    MU,
    SqModel,
    sq_adc_topk,
    sq_train,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def model(emb):
    return sq_train(emb)


def test_codes_in_range_and_extremes(model, emb):
    n = emb.count()
    stats = model.codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.count("*").alias("n"),
    ).first()
    assert stats["n"] == n
    assert 0 <= stats["lo"] and stats["hi"] <= 255
    # the per-dim min encodes to 0 and the per-dim max to 255 — check
    # dim 1 explicitly via the model's own grid
    row = model.codes.join(
        emb.select("vec_id", F.element_at("embedding", 1).alias("x")), "vec_id"
    ).select(F.element_at("codes", 1).alias("c"), "x")
    mn, mx = model.mins[0], model.maxs[0]
    for r in row.collect():
        q = math.floor(float(r["x"]) * MU)
        want = 0 if mx == mn else min(255, ((q - mn) * 256) // (mx - mn))
        assert r["c"] == want


def test_constant_dim_is_exact(spark):
    rows = [(i, [1.5, float(i)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = sq_train(df)
    assert m.mins[0] == m.maxs[0] == math.floor(1.5 * MU)
    out = sq_adc_topk(m, [1.5, 0.0], topk=8).collect()
    # constant dim contributes zero error; dim 2's winner is vec 0
    assert out[0]["vec_id"] == 0
    assert all(r["sq_dist"] >= 0 for r in out)


def test_adc_topk_deterministic_and_self_close(model, emb):
    query = list(emb.orderBy("vec_id").limit(1).select("embedding").first()[0])
    a = sq_adc_topk(model, query, topk=10).collect()
    b = sq_adc_topk(model, query, topk=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 10
    # midpoint decode error per dim is <= rng/512 (+integer floors);
    # the query's own vector must beat that bound summed over dims
    bound = sum(
        ((mx - mn) // 512 + 2) ** 2 for mn, mx in zip(model.mins, model.maxs)
    )
    qid = emb.agg(F.min("vec_id")).first()[0]
    self_dist = {r["vec_id"]: r["sq_dist"] for r in a}.get(qid)
    assert self_dist is not None and self_dist <= bound


def test_recall_vs_exact(model, emb):
    query = list(emb.orderBy("vec_id").limit(1).select("embedding").first()[0])
    qq = F.array(*[F.lit(math.floor(float(x) * MU)).cast("long") for x in query])
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * MU).cast("long")
        ).alias("q"),
    )
    exact = (
        quant.select(
            "vec_id",
            F.aggregate(
                F.zip_with("q", qq, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(10)
    )
    want = {r["vec_id"] for r in exact.collect()}
    got = {r["vec_id"] for r in sq_adc_topk(model, query, topk=10).collect()}
    # 8 bits/dim is a fine grid — expect high overlap with exact top-10
    assert len(want & got) >= 7
