"""As-of (time-series) join — SURVEY.md §2 B6.

Spark has no ASOF JOIN builtin. This is the scalable composition:
tag both sides, union, and take ``last(value ignoring nulls)`` over a
window partitioned by key and ordered by (ts, side). That is ONE
shuffle on the join key and a per-partition sort — O(n log n) within
partitions, no point-lookup loop, no broadcast of the big side — which
is exactly the plan you want at 100 TB (both sides co-partitioned by
key; AQE handles skewed keys).

Semantics = ``pandas.merge_asof(direction="backward",
allow_exact_matches=True)`` = DuckDB ``ASOF LEFT JOIN`` on
``l.ts >= r.ts``: every left row is kept and annotated with the value
columns of the latest right row at-or-before its timestamp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    values: list[str],
) -> DataFrame:
    """Backward as-of left join; right ``values`` columns are appended to
    every left row (null when no right row precedes it)."""
    keys = [on] if isinstance(on, str) else list(on)
    ts = "_asof_ts"
    right_types = {f.name: f.dataType for f in right.schema.fields}

    left_payload = [c for c in left.columns if c not in keys]
    l = left.select(
        *keys,
        F.col(left_ts).alias(ts),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right_types[v]).alias(f"_r_{v}") for v in values],
        F.lit(1).alias(_SIDE),
    )
    left_types = {f.name: f.dataType for f in left.schema.fields}
    r = right.select(
        *keys,
        F.col(right_ts).alias(ts),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        *[F.col(v).alias(f"_r_{v}") for v in values],
        F.lit(0).alias(_SIDE),
    )

    # side=0 (right) sorts before side=1 (left) at equal ts → exact
    # matches are visible to the left row (allow_exact_matches=True).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(ts), F.asc(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r)
    for v in values:
        unioned = unioned.withColumn(f"_r_{v}", F.last(f"_r_{v}", ignorenulls=True).over(w))

    out = unioned.filter(F.col(_SIDE) == 1).select(
        *keys,
        F.col(ts).alias(left_ts),
        *[F.col(c) for c in left_payload],
        *[F.col(f"_r_{v}").alias(v) for v in values],
    )
    return out
