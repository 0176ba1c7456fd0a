"""Funnel + retention operators (operators/events.py): greedy
sequential semantics, strict-after tie handling, cohort math."""

from __future__ import annotations

from datetime import datetime

import pytest

from ark_invest_api_rust_data_spark.operators.events import funnel, retention_cohorts


def _ts(day, h=0, m=0):
    return datetime(2024, 1, day, h, m)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_funnel_progression_and_partial(spark):
    rows = [
        # u1 completes all three in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2 stops after click
        (2, _ts(1), "view"), (2, _ts(2), "click"),
        # u3 has purchase BEFORE view: stage 1 only
        (3, _ts(1), "purchase"), (3, _ts(2), "view"),
        # u4 only non-step events -> absent entirely
        (4, _ts(1), "error"),
        # u5 has click but never view: stage 0
        (5, _ts(1), "click"), (5, _ts(2), "purchase"),
    ]
    got = {r["user_id"]: r for r in funnel(_df(spark, rows)).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert (got[1]["stage"], got[1]["t1"], got[1]["t2"], got[1]["t3"]) == (
        3, _ts(1), _ts(2), _ts(3))
    assert got[2]["stage"] == 2 and got[2]["t3"] is None
    assert got[3]["stage"] == 1 and got[3]["t1"] == _ts(2)
    assert got[5]["stage"] == 0 and got[5]["t1"] is None


def test_funnel_strict_after_ties(spark):
    # click at exactly the view timestamp must NOT advance; the later
    # click does
    rows = [
        (1, _ts(1), "view"), (1, _ts(1), "click"), (1, _ts(2), "click"),
        # u2: click only at the tie -> stuck at stage 1
        (2, _ts(1), "view"), (2, _ts(1), "click"),
    ]
    got = {r["user_id"]: r for r in funnel(_df(spark, rows)).collect()}
    assert got[1]["stage"] == 2 and got[1]["t2"] == _ts(2)
    assert got[2]["stage"] == 1


def test_funnel_takes_earliest_qualifying(spark):
    # two qualifying clicks: t2 must be the earlier one
    rows = [
        (1, _ts(1), "view"), (1, _ts(5), "click"), (1, _ts(3), "click"),
        (1, _ts(4), "purchase"),
    ]
    r = funnel(_df(spark, rows)).first()
    assert r["t2"] == _ts(3)
    assert r["stage"] == 3 and r["t3"] == _ts(4)


def test_funnel_generic_steps(spark):
    rows = [
        (1, _ts(1), "a"), (1, _ts(2), "b"), (1, _ts(3), "c"), (1, _ts(4), "d"),
        (2, _ts(1), "a"), (2, _ts(2), "c"),
    ]
    got = {r["user_id"]: r for r in
           funnel(_df(spark, rows), steps=("a", "b", "c", "d")).collect()}
    assert got[1]["stage"] == 4 and got[1]["t4"] == _ts(4)
    assert got[2]["stage"] == 1


def test_funnel_validates_steps(spark):
    with pytest.raises(ValueError):
        funnel(_df(spark, [(1, _ts(1), "view")]), steps=())


def test_retention_cohorts(spark):
    rows = [
        # cohort day 1: u1 active days 1,2,4; u2 active day 1 only
        (1, _ts(1), "view"), (1, _ts(2), "view"), (1, _ts(4), "view"),
        (1, _ts(1, 5), "click"),  # same day twice -> still one user
        (2, _ts(1), "view"),
        # cohort day 2: u3 active days 2 and 4
        (3, _ts(2), "view"), (3, _ts(4), "view"),
    ]
    got = {(r["cohort_d"].isoformat(), r["day_offset"]): r["n_users"]
           for r in retention_cohorts(_df(spark, rows)).collect()}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 2): 1,
    }


# ------------------------------------------------ EWMA + transitions
def _py_ewma(vals: list[int], den: int = 4) -> int:
    r = vals[0]
    for v in vals[1:]:
        # floor division (Python // floors — the operator's contract)
        r = ((den - 1) * r + v) // den
    return r


def test_ewma_matches_reference_including_negatives(spark):
    from datetime import datetime

    from ark_invest_api_rust_data_spark.operators.events import ewma

    rows = [
        # (event_id, ts, user, value) — negative values exercise the
        # floor-div (pmod) path where `div` would truncate instead
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, 10.5),
        (2, datetime(2024, 1, 1, 0, 0, 1), 1, -3.2),
        (3, datetime(2024, 1, 1, 0, 0, 2), 1, 7.9),
        (4, datetime(2024, 1, 1, 0, 0, 0), 2, -1.0),
        (5, datetime(2024, 1, 1, 0, 0, 3), 2, -2.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma(df).collect()
    }
    import math

    def q(v):
        return math.floor(v * 1000)

    assert got == {
        1: (3, _py_ewma([q(10.5), q(-3.2), q(7.9)])),
        2: (2, _py_ewma([q(-1.0), q(-2.5)])),
    }


def test_ewma_single_event_is_identity(spark):
    from datetime import datetime

    from ark_invest_api_rust_data_spark.operators.events import ewma

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 9, 2.25)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    out = ewma(df).collect()
    assert out[0]["ewma"] == 2250 and out[0]["n_events"] == 1


def test_transitions_deterministic_under_ts_ties(spark):
    from datetime import datetime

    from ark_invest_api_rust_data_spark.operators.events import (
        transition_counts,
    )

    t = datetime(2024, 1, 1)
    rows = [
        (2, t, 1, "b"),  # same ts — event_id orders: a (id 1) then b
        (1, t, 1, "a"),
        (3, datetime(2024, 1, 2), 1, "c"),
        (4, t, 2, "a"),
    ]
    cols = "event_id long, ts timestamp, user_id long, event_type string"
    a = spark.createDataFrame(rows, cols)
    b = spark.createDataFrame(list(reversed(rows)), cols)
    ta = sorted(map(tuple, transition_counts(a).collect()))
    tb = sorted(map(tuple, transition_counts(b).collect()))
    assert ta == tb == [("a", "b", 1), ("b", "c", 1)]
