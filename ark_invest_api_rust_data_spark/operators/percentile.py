"""Distributed EXACT percentiles without per-group concentration
(SURVEY.md §2 B8 hardening, round 4).

``percentile_disc`` ships every group's full value set to one reducer
— correct, but a straggler when a group holds billions of rows (the
round-2/3 weak flag on b08). This tier computes the IDENTICAL result
through a value histogram:

1. count per (group, value) — ONE partial+final aggregation whose
   map-side combine collapses each partition to its distinct values
   (shuffle is O(distinct values), not O(rows));
2. cumulative counts over the per-group histogram — a window whose
   partition holds one row PER DISTINCT VALUE (o_totalprice has ~100k
   distinct cents at any scale; l_quantity has 50), bounded regardless
   of group row count;
3. the answer is the smallest value whose cumulative distribution
   reaches p — ``min(value) where cum/n >= p`` — folded with one
   conditional min per requested percentile.

The selection rule ``cum/n >= p`` (one double division) is exactly
Spark's ``percentile_disc`` cume_dist rule, so the tier is
bit-equivalent to the built-in (pinned by pytest on every group) and
shares the b08 oracle. At 100 TB the worst window partition is the
value-domain size, not the group size — the straggler is gone.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def exact_percentile_hist(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
) -> DataFrame:
    """One row per group with a column per requested percentile
    (``{"p50": 0.5, "p90": 0.9}``), exact ``percentile_disc``
    semantics via the histogram plan above. Null values are excluded,
    matching the built-in aggregate — including its all-null edge: a
    group whose values are ALL null still appears in the output, with
    null percentile columns (ADVICE r4: the histogram drops such
    groups, so the result is left-joined back onto the distinct group
    keys; the extra aggregation's shuffle is O(groups) after map-side
    combine, and the join's build side is the O(groups) result)."""
    if not percentiles:
        raise ValueError("percentiles must be non-empty")
    for name, p in percentiles.items():
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {name}={p} outside [0, 1]")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count("*").alias("_c"))
    )
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    tot = hist.groupBy(*group_cols).agg(F.sum("_c").alias("_n"))
    # NULL group keys are regular groups for percentile_disc (windows
    # and groupBy treat null as a value), so both joins must match null
    # keys: equality keys would emit null percentiles for them
    # (ADVICE r5). eqNullSafe on every group col keeps the bit-
    # equivalence claim for null-keyed groups too.
    def _nullsafe(left: DataFrame, right: DataFrame, how: str) -> DataFrame:
        cond = None
        for c in group_cols:
            e = left[c].eqNullSafe(right[c])
            cond = e if cond is None else cond & e
        out = left.join(right, cond, how)
        return out.select(
            *[left[c] for c in group_cols],
            *[c for c in right.columns if c not in group_cols],
            *[c for c in left.columns if c not in group_cols],
        )

    j = _nullsafe(cum, tot, "inner")  # tot is O(groups): AQE broadcasts
    ratio = F.col("_cum").cast("double") / F.col("_n").cast("double")
    res = j.groupBy(*group_cols).agg(
        *[
            F.min(F.when(ratio >= F.lit(p), F.col(value_col))).alias(name)
            for name, p in percentiles.items()
        ]
    )
    return _nullsafe(df.select(*group_cols).distinct(), res, "left")
