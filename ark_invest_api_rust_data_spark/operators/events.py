"""Event-sequence analytics over the events table (SURVEY.md §2
B12/B16 extensions): sequential funnels and retention cohorts — the
two staple product-analytics queries a warehouse engine is expected to
answer over event streams.

Scale shapes:

* funnel: ONE shuffle (groupBy user) collecting each user's step
  events into a sorted array, then a doc-local expression fold walks
  the sequence greedily — events-per-user is the bounded quantity
  (same per-key bound as sessionization), so the fold is narrow and
  the plan is a single exchange at any corpus size. The greedy
  earliest-progression fold computes exactly the classic nested
  min-ts funnel (t_{i+1} = min ts of step i+1 strictly after t_i) —
  the oracle states it in that subquery form, so the hash compare
  proves the equivalence.

* retention: first-event cohort per user (one shuffle), join back on
  the user key (co-partitioned with the agg — AQE reuses the
  exchange), then count distinct users per (cohort, offset) cell.
  Cell count is bounded by days², not corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def funnel(
    df: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sequential funnel: per user, the furthest step reached where
    each step's event must occur STRICTLY after the previous step's
    matched event. Returns (user, stage, t1..tk) — stage = number of
    steps completed, t_i = timestamp that completed step i (null past
    the reached stage). Users with no step-type events are absent
    (filter first — predicate pushes to the scan).

    Equal-timestamp ties: a step-i+1 event at exactly t_i does NOT
    advance the funnel (strict >), so the result is independent of
    the sort order among same-timestamp events.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    ev = df.filter(F.col(type_col).isin(*steps)).select(user_col, ts_col, type_col)
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct(ts_col, type_col))).alias("_evs")
    )

    init = F.struct(
        F.lit(0).alias("stage"),
        F.array().cast("array<timestamp>").alias("hits"),
    )

    def advance(acc: Column, e: Column) -> Column:
        # branch conditions are mutually exclusive (acc.stage == i);
        # F.get is the null-on-out-of-bounds accessor — when-branch
        # evaluation is not short-circuited, so an ANSI element_at
        # would throw on the branches whose stage doesn't match
        out = acc
        for i, s in enumerate(steps):
            cond = (acc["stage"] == i) & (e[type_col] == s)
            if i > 0:
                cond = cond & (e[ts_col] > F.get(acc["hits"], i - 1))
            branch = F.struct(
                F.lit(i + 1).alias("stage"),
                F.concat(acc["hits"], F.array(e[ts_col])).alias("hits"),
            )
            out = F.when(cond, branch) if i == 0 else out.when(cond, branch)
        return out.otherwise(acc)

    folded = per_user.select(
        user_col, F.aggregate("_evs", init, advance).alias("_f")
    )
    return folded.select(
        user_col,
        F.col("_f.stage").cast("int").alias("stage"),
        *[
            F.get(F.col("_f.hits"), i).alias(f"t{i + 1}")
            for i in range(k)
        ],
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention matrix: users bucket into cohorts by first-activity
    date; each (cohort_d, day_offset) cell counts the distinct cohort
    users active that many days later. Offset 0 equals cohort size."""
    ev = df.select(F.col(user_col), F.to_date(F.col(ts_col)).alias("_d"))
    cohort = ev.groupBy(user_col).agg(F.min("_d").alias("cohort_d"))
    return (
        ev.join(cohort, user_col)
        .groupBy(
            "cohort_d", F.datediff("_d", "cohort_d").cast("int").alias("day_offset")
        )
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )


def ewma(
    df: DataFrame,
    alpha_den: int = 4,
    value_scale: int = 1000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user exponential moving average of the event value stream —
    the staple time-series smoothing operator — in exact integer fixed
    point so it hash-matches a SQL oracle.

    Contract: values quantize to ``floor(value·value_scale)`` int64
    (one IEEE multiply + floor — identical in any engine), the stream
    sorts on (ts, event_id) (event ids are unique, so the order is
    total), and the fold is ``r' = ((alpha_den−1)·r + v) fdiv
    alpha_den`` seeded with the first value (α = 1/alpha_den; fdiv is
    FLOOR division via the pmod identity — Spark's ``div`` truncates
    toward zero and would disagree with DuckDB's ``//`` on negative
    values).  Returns (user, n_events, ewma).

    Scale shape: ONE shuffle (groupBy user) into a sorted array, then
    a doc-local expression fold — events-per-user is the bounded
    quantity, same as funnel/sessionize."""
    q = F.floor(F.col(value_col) * F.lit(value_scale)).cast("long")
    per_user = (
        df.select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(event_col).alias("eid"),
                q.alias("v"),
            ).alias("_e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("_e")).alias("_evs"))
    )
    a1 = alpha_den - 1
    step = (
        lambda acc, x: (
            (a1 * acc + x["v"])
            - F.pmod(a1 * acc + x["v"], F.lit(alpha_den))
        )
        / alpha_den
    )
    return per_user.select(
        user_col,
        F.size("_evs").cast("long").alias("n_events"),
        F.aggregate(
            F.slice("_evs", 2, F.size("_evs") - 1),
            F.get(F.col("_evs"), 0)["v"].cast("long"),
            lambda acc, x: step(acc, x).cast("long"),
        ).alias("ewma"),
    )


def transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Markov transition counts over per-user event sequences: how
    often event type A is immediately followed by type B — the
    session-path mining primitive behind "next action" analytics.
    One window shuffle on the user key; the (ts, event_id) sort is
    total (unique event ids), so the bigram multiset is
    deterministic.  Returns (prev_type, next_type, n)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, event_col)
    return (
        df.select(
            F.col(type_col).alias("prev_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
