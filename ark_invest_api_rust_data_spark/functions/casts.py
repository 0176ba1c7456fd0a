"""Type-cast / parse expressions (SURVEY.md §2 C1–C5, C8, C9).

Everything is a guarded column expression — guards branch on the
resolved schema (``df.schema``), which in Spark is free (no action),
unlike the reference's eager ``collect()`` before every introspection
(/root/reference/src/util.rs:154).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

# Candidate formats, tried in order (/root/reference/src/util.rs:231-237).
# None = engine inference (ISO) — Polars strptime(format=None) ≙ to_date(c).
DATE_FORMATS: list[str | None] = ["M/d/yyyy", "yyyy/M/d", None]


def _try_parse(c: Column, fmt: str | None) -> Column:
    # try_to_date ≙ Polars strptime(strict=false): null on parse failure
    # (plain to_date THROWS under Spark 4's default ANSI mode).
    return F.try_to_date(c, fmt) if fmt is not None else F.try_to_date(c)


def parse_date_with_budget(df: DataFrame, colname: str = "date") -> DataFrame:
    """C1 — multi-format date parse with a 10%-null rejection budget.

    The reference tries each format and REJECTS it if more than
    height/10 rows fail to parse (/root/reference/src/util.rs:224-226),
    falling through to the next; if all candidates fail the column is
    left as-is. One small aggregate action computes the null count of
    every candidate in a single pass (the reference materializes per
    try; we don't need to).
    """
    if not isinstance(df.schema[colname].dataType, T.StringType):
        return df
    c = F.col(colname)
    stats = df.agg(
        F.count(F.lit(1)).alias("h"),
        *[
            F.count(_try_parse(c, fmt)).alias(f"ok_{i}")
            for i, fmt in enumerate(DATE_FORMATS)
        ],
    ).first()
    h = stats["h"]
    if h == 0:
        return df
    for i, fmt in enumerate(DATE_FORMATS):
        nulls = h - stats[f"ok_{i}"]
        if not nulls > h // 10:  # reference: reject iff null_count > height/10
            return df.withColumn(colname, _try_parse(c, fmt))
    return df  # all formats rejected → column stays string (parity)


def percent_to_double(c: Column) -> Column:
    """C2 — strip the FIRST '%' (Polars str.replace literal semantics,
    /root/reference/src/util.rs:250-255), cast double. A malformed
    '1%2%' leaves '12%' behind and the cast fails loudly in BOTH
    engines; stripping all '%' would instead silently succeed here."""
    from .strings import replace_first

    return replace_first(c, "%", "").cast("double")


def currency_to_long(c: Column) -> Column:
    """C3 — strip the FIRST '$' (reference str.replace is
    first-occurrence, /root/reference/src/util.rs:264-267) then all
    ',', cast double THEN long: the double→long truncation-toward-zero
    is load-bearing (/root/reference/src/util.rs:264-272)."""
    from .strings import replace_first

    cleaned = F.replace(replace_first(c, "$", ""), F.lit(","), F.lit(""))
    return cleaned.cast("double").cast("long")


def thousands_to_long(c: Column) -> Column:
    """C4 — strip all ',', cast long."""
    return F.replace(c, F.lit(","), F.lit("")).cast("long")


def derive_share_price(mv: Column, shares: Column) -> Column:
    """C8 — share_price = round(mv/shares, 2); Spark HALF_UP equals
    Polars half-away-from-zero for the non-negative domain here."""
    return F.round(mv.cast("double") / shares.cast("double"), 2)


def repair_dtypes(df: DataFrame) -> DataFrame:
    """C9 — final dtype repair (/root/reference/src/util.rs:452-476):
    float→long for market_value/shares, long→double for
    share_price/weight when mistyped."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    out = []
    for name in df.columns:
        c = F.col(name)
        if name in ("market_value", "shares") and isinstance(fields[name], T.DoubleType):
            c = c.cast("long").alias(name)
        elif name in ("share_price", "weight") and isinstance(fields[name], T.LongType):
            c = c.cast("double").alias(name)
        out.append(c)
    return df.select(out)
