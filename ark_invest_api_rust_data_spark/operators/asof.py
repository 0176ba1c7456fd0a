"""As-of (time-series) join — SURVEY.md §2 B6.

Spark has no ASOF JOIN builtin. This is the scalable composition:
tag both sides, union, and take ``last(value ignoring nulls)`` over a
window partitioned by key and ordered by (ts, side). That is ONE
shuffle on the join key and a per-partition sort — O(n log n) within
partitions, no point-lookup loop, no broadcast of the big side — which
is exactly the plan you want at 100 TB (both sides co-partitioned by
key; AQE handles skewed keys).

Semantics match ``pandas.merge_asof`` (tested against it directly):

* ``direction="backward"`` (default): latest right row at-or-before
  the left timestamp — DuckDB ``ASOF LEFT JOIN`` on ``l.ts >= r.ts``.
* ``direction="forward"``: earliest right row at-or-after.
* ``direction="nearest"``: whichever of the two is closer in time
  (backward wins exact ties, like merge_asof) — computed by running
  BOTH window folds over the same union in one pass, then choosing
  per row; still one shuffle on the key.
* ``tolerance_seconds``: matches further than the tolerance are
  nulled, like merge_asof's ``tolerance`` (for ``nearest``, each side
  is masked before the choice, so a too-far backward match never
  shadows an in-range forward one).

``allow_exact_matches=True`` always: at equal timestamps the right row
is visible to the left row (side ordering per direction).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE = "_asof_side"
_RTS = "_asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    values: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of left join; right ``values`` columns are appended to every
    left row (null when no right row qualifies)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    ts = "_asof_ts"
    right_types = {f.name: f.dataType for f in right.schema.fields}
    carried = list(values) + [_RTS]  # also carry the matched right ts

    # left_ts is re-emitted under its own name in the output, so it is
    # excluded from the payload — otherwise the result would carry two
    # columns named left_ts (ambiguous for any by-name select)
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    l = left.select(
        *keys,
        F.col(left_ts).alias(ts),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right_types[v]).alias(f"_r_{v}") for v in values],
        F.lit(None).cast(right_types[right_ts]).alias(f"_r_{_RTS}"),
        F.lit(1).alias(_SIDE),
    )
    left_types = {f.name: f.dataType for f in left.schema.fields}
    r = right.select(
        *keys,
        F.col(right_ts).alias(ts),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        *[F.col(v).alias(f"_r_{v}") for v in values],
        F.col(right_ts).alias(f"_r_{_RTS}"),
        F.lit(0).alias(_SIDE),
    )
    unioned = l.unionByName(r)

    def _secs(c):
        # epoch seconds via an explicit timestamp cast first: a no-op
        # for TIMESTAMP, the only legal numeric route for TIMESTAMP_NTZ
        return c.cast("timestamp").cast("double")

    if direction == "nearest":
        # BOTH folds over the same union — one shuffle, then a per-row
        # choice. Backward fold: right sorts before left at equal ts
        # (exact matches visible); forward fold: after.
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.asc(ts), F.asc(_SIDE))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.asc(ts), F.desc(_SIDE))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        for v in carried:
            unioned = unioned.withColumn(
                f"_b_{v}", F.last(f"_r_{v}", ignorenulls=True).over(wb)
            ).withColumn(f"_f_{v}", F.first(f"_r_{v}", ignorenulls=True).over(wf))
        out = unioned.filter(F.col(_SIDE) == 1)
        gb = _secs(F.col(ts)) - _secs(F.col(f"_b_{_RTS}"))
        gf = _secs(F.col(f"_f_{_RTS}")) - _secs(F.col(ts))
        b_ok = F.col(f"_b_{_RTS}").isNotNull()
        f_ok = F.col(f"_f_{_RTS}").isNotNull()
        if tolerance_seconds is not None:
            tol = F.lit(float(tolerance_seconds))
            b_ok = b_ok & (gb <= tol)
            f_ok = f_ok & (gf <= tol)
        take_backward = b_ok & (~f_ok | (gb <= gf))  # backward wins ties
        for v in values:
            out = out.withColumn(
                f"_r_{v}",
                F.when(take_backward, F.col(f"_b_{v}")).when(f_ok, F.col(f"_f_{v}")),
            )
        return out.select(
            *keys,
            F.col(ts).alias(left_ts),
            *[F.col(c) for c in left_payload],
            *[F.col(f"_r_{v}").alias(v) for v in values],
        )

    if direction == "backward":
        # right (side=0) sorts BEFORE left at equal ts → exact matches
        # visible; take last non-null over the preceding frame
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc(ts), F.asc(_SIDE))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for v in carried:
            unioned = unioned.withColumn(f"_r_{v}", F.last(f"_r_{v}", ignorenulls=True).over(w))
    else:
        # right sorts AFTER left at equal ts → exact matches inside the
        # following frame; take first non-null
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc(ts), F.desc(_SIDE))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        for v in carried:
            unioned = unioned.withColumn(f"_r_{v}", F.first(f"_r_{v}", ignorenulls=True).over(w))

    out = unioned.filter(F.col(_SIDE) == 1)
    if tolerance_seconds is not None:
        gap = (
            _secs(F.col(ts)) - _secs(F.col(f"_r_{_RTS}"))
            if direction == "backward"
            else _secs(F.col(f"_r_{_RTS}")) - _secs(F.col(ts))
        )
        in_tol = F.col(f"_r_{_RTS}").isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
        for v in values:
            out = out.withColumn(f"_r_{v}", F.when(in_tol, F.col(f"_r_{v}")))

    return out.select(
        *keys,
        F.col(ts).alias(left_ts),
        *[F.col(c) for c in left_payload],
        *[F.col(f"_r_{v}").alias(v) for v in values],
    )
