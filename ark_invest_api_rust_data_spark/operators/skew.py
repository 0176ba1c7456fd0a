"""Skew-aware join helper (SURVEY §7 hard part 9 — 100 TB posture).

First line of defense is AQE's skew-join splitting (on by default in
session.py). This utility is the explicit fallback for pathological
keys AQE can't fix — e.g. a fact-fact join where one key holds >5% of
all rows: salt the skewed (large) side with N shards and explode the
build side N× so every shard still finds its match. Trades N× build-
side duplication for an even shuffle — use only on keys proven skewed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT = "_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with the large side
    salted into ``num_salts`` shards. Deterministic salt (hash of the
    full row is unnecessary — any uniform spread works; we use a
    non-cryptographic hash of a monotonic id to avoid correlating with
    the key)."""
    salted_large = large.withColumn(
        SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    exploded_small = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = salted_large.join(exploded_small, [on, SALT], how)
    return out.drop(SALT)
