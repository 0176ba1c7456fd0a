"""SCD Type-2 merge (operators/merge.py:scd2_apply): close-and-open
on real changes, no-op updates untouched, null-safe comparison,
closed history passthrough, repeated merge rounds."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from pyspark.sql import types as T

from ark_invest_api_rust_data_spark.operators.merge import scd2_apply

D = datetime.date
SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("other", T.LongType()),
        T.StructField("valid_from", T.DateType()),
        T.StructField("valid_to", T.DateType()),
    ]
)


def _dim(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string")


def test_scd2_close_open_noop_and_missing(spark):
    dim = _dim(
        spark,
        [
            (1, "a", 10, D(2024, 1, 1), None),  # will change
            (2, "b", 20, D(2024, 1, 1), None),  # no-op update
            (3, "c", 30, D(2024, 1, 1), None),  # no update at all
        ],
    )
    out = scd2_apply(
        dim, _upd(spark, [(1, "A"), (2, "b")]), "k", ["attr"], "2024-06-01"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["k"], []).append(r)
    # key 1: closed old + open new carrying non-tracked cols forward
    v1 = sorted(by[1], key=lambda r: r["valid_from"])
    assert len(v1) == 2
    assert (v1[0]["attr"], v1[0]["valid_to"]) == ("a", D(2024, 6, 1))
    assert (v1[1]["attr"], v1[1]["valid_from"], v1[1]["valid_to"]) == (
        "A", D(2024, 6, 1), None)
    assert v1[1]["other"] == 10  # untracked column carried forward
    # keys 2 and 3: single open row, untouched
    for k in (2, 3):
        assert len(by[k]) == 1
        assert by[k][0]["valid_to"] is None and by[k][0]["attr"] in ("b", "c")


def test_scd2_null_safe_comparison(spark):
    dim = _dim(spark, [(1, None, 1, D(2024, 1, 1), None),
                       (2, "x", 2, D(2024, 1, 1), None)])
    # null -> null is a no-op; "x" -> null is a change
    out = scd2_apply(
        dim, _upd(spark, [(1, None), (2, None)]), "k", ["attr"], "2024-06-01"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["k"], []).append(r)
    assert len(by[1]) == 1 and by[1][0]["valid_to"] is None
    assert len(by[2]) == 2
    assert sorted((r["attr"] is None, r["valid_to"] is None) for r in by[2]) == [
        (False, False), (True, True)]


def test_scd2_history_passthrough_and_second_round(spark):
    dim = _dim(
        spark,
        [
            (1, "a", 1, D(2023, 1, 1), D(2024, 1, 1)),  # closed history
            (1, "b", 1, D(2024, 1, 1), None),
        ],
    )
    once = scd2_apply(dim, _upd(spark, [(1, "c")]), "k", ["attr"], "2024-06-01")
    twice = scd2_apply(once, _upd(spark, [(1, "d")]), "k", ["attr"], "2024-09-01")
    rows = sorted(twice.collect(), key=lambda r: r["valid_from"])
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in rows] == [
        ("a", D(2023, 1, 1), D(2024, 1, 1)),
        ("b", D(2024, 1, 1), D(2024, 6, 1)),
        ("c", D(2024, 6, 1), D(2024, 9, 1)),
        ("d", D(2024, 9, 1), None),
    ]
    # exactly one open row at any time
    assert sum(1 for r in rows if r["valid_to"] is None) == 1


def test_scd2_inserts_unknown_keys(spark):
    dim = _dim(spark, [(1, "a", 10, D(2024, 1, 1), None)])
    out = scd2_apply(
        dim, _upd(spark, [(9, "z")]), "k", ["attr"], "2024-06-01"
    ).collect()
    by = {r["k"]: r for r in out}
    assert set(by) == {1, 9}
    assert by[1]["valid_to"] is None and by[1]["attr"] == "a"  # untouched
    assert (by[9]["attr"], by[9]["valid_from"], by[9]["valid_to"]) == (
        "z", D(2024, 6, 1), None)
    assert by[9]["other"] is None  # untracked attr unknown for inserts

def test_scd2_stale_update_is_noop(spark):
    # an update whose effective PREDATES the open row's valid_from must
    # not invert the interval (valid_to < valid_from) — it is a no-op
    dim = _dim(spark, [(1, "new", 1, D(2024, 6, 1), None)])
    out = scd2_apply(
        dim, _upd(spark, [(1, "old")]), "k", ["attr"], "2024-01-02"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["attr"], r["valid_from"], r["valid_to"]) == (
        "new", D(2024, 6, 1), None)


def test_scd2_same_day_correction_applies(spark):
    # effective == valid_from is a legitimate same-day correction:
    # zero-length closed interval, not an inversion
    dim = _dim(spark, [(1, "a", 1, D(2024, 6, 1), None)])
    rows = sorted(
        scd2_apply(
            dim, _upd(spark, [(1, "A")]), "k", ["attr"], "2024-06-01"
        ).collect(),
        key=lambda r: (r["valid_to"] is None, r["attr"]),
    )
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in rows] == [
        ("a", D(2024, 6, 1), D(2024, 6, 1)),
        ("A", D(2024, 6, 1), None),
    ]


def test_scd2_empty_tracked_raises(spark):
    import pytest

    dim = _dim(spark, [(1, "a", 1, D(2024, 1, 1), None)])
    with pytest.raises(ValueError, match="tracked"):
        scd2_apply(dim, _upd(spark, [(1, "b")]), "k", [], "2024-06-01")
