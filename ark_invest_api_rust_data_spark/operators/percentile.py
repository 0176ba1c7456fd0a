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
    null percentile columns (ADVICE r4; since r12 such groups survive
    as the histogram's NULL-value row instead of a separate
    distinct-groups scan + left join — see the inline comment)."""
    if not percentiles:
        raise ValueError("percentiles must be non-empty")
    for name, p in percentiles.items():
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {name}={p} outside [0, 1]")
    # r12 (guide §2.4 "remove shuffles outright"): one exchange on the
    # group key serves the cumulative window, the per-group total (a
    # whole-partition window — no separate tot aggregation, no
    # cum⋈tot join), AND the final fold (groupBy on the window's own
    # partitioning adds no exchange). NULL values stay IN the
    # histogram as a per-group NULL row contributing 0 to both sums —
    # that keeps all-null groups in the output with NULL percentiles
    # (the former behavior) without the extra df.distinct() scan,
    # exchange and left join back. Selection math is unchanged: _cum
    # and _n are the same int64 values, the ratio the same single
    # double division as percentile_disc's cume_dist rule (an all-null
    # group divides 0/0, which Spark defines as NULL → NULL output,
    # exactly like the former left join's miss).
    hist = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("_c"))
    nn = F.col(value_col).isNotNull()
    live = F.when(nn, F.col("_c")).otherwise(F.lit(0))
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wall = Window.partitionBy(*group_cols)
    cum = hist.withColumn("_cum", F.sum(live).over(w)).withColumn(
        "_n", F.sum(live).over(wall)
    )
    ratio = F.col("_cum").cast("double") / F.col("_n").cast("double")
    return cum.groupBy(*group_cols).agg(
        *[
            F.min(
                F.when(nn & (ratio >= F.lit(p)), F.col(value_col))
            ).alias(name)
            for name, p in percentiles.items()
        ]
    )
