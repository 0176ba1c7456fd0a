"""The normalizer — Spark-first re-expression of the reference's
``df_format`` (/root/reference/src/util.rs:153-497).

One lazy projection pipeline; every step is guarded by resolved-schema
checks (free in Spark — no action). The only action inside is the tiny
date-format-budget aggregate (C1), and only when ``date`` arrives as a
string.

Convergence, not one-shot idempotence: security rules run BEFORE the
C7 company cleanup (same order as the reference, util.rs:240), so rule
cascades can need several passes — e.g. ``ROCKET LAB USA INC`` →
(C7) ``ROCKET LAB USA`` → (R8) ``ROCKET LAB`` → (R8) ticker ``RKLB``.
The reference has the same property and papers over it by re-formatting
3× per run (§3.1); we do the same in pipeline.py, and property-test
that 3 applications reach the fixpoint (tests/test_properties.py).

Pipeline order (same as the reference, which is load-bearing):
adapters → conditional renames → drops → date parse → security rules →
cast chain + name cleanup → null-date filter → share_price derivation →
dtype repair → canonical projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.casts import (
    currency_to_long,
    derive_share_price,
    parse_date_with_budget,
    percent_to_double,
    repair_dtypes,
    thousands_to_long,
)
from ..functions.rules import apply_security_rules
from ..functions.strings import clean_company_df, clean_ticker
from .adapters import DataSource, apply_provider_adapters

CANONICAL_COLS = [
    "date",
    "ticker",
    "cusip",
    "company",
    "market_value",
    "shares",
    "share_price",
    "weight",
]
SHORT_COLS = ["date", "ticker", "cusip", "company", "weight"]


def _field_type(df: DataFrame, name: str) -> T.DataType | None:
    for f in df.schema.fields:
        if f.name == name:
            return f.dataType
    return None


def normalize(df: DataFrame, source: DataSource | None = None) -> DataFrame:
    """Full ``df_format`` parity. Returns the canonical 8-column frame,
    or the 5-column short variant when no market-value data exists
    (util.rs:478-494)."""
    df = apply_provider_adapters(df, source)

    # P2 — conditional renames, including the reference's asymmetric
    # guards (check `weight_($)`/`weight ($)` but rename `weight_(%)`/
    # `weight (%)`, util.rs:171-176,189-194). We add the existence
    # check on the rename SOURCE: in the reference a triggered-but-
    # missing rename is a hard error; here it's unreachable dead state
    # and skipping keeps the pipeline total.
    renames = [
        ("market_value_($)", "market_value_($)", "market_value"),
        ("weight_($)", "weight_(%)", "weight"),
        ("market value ($)", "market value ($)", "market_value"),
        ("weight (%)", "weight (%)", "weight"),
        ("weight ($)", "weight (%)", "weight"),
    ]
    for guard, old, new in renames:
        if guard in df.columns and old in df.columns:
            df = df.withColumnRenamed(old, new)

    # P3 — drop noise columns / empty-named columns (util.rs:196-207)
    df = df.drop("fund", "weight_rank")
    if "" in df.columns:
        df = df.select([c for c in df.columns if c != ""])

    # C1 — date parse with 10% null budget, only if not already a date
    if "date" in df.columns and not isinstance(_field_type(df, "date"), T.DateType):
        df = parse_date_with_budget(df, "date")

    # R1–R12 — security-master rules run BEFORE the cast chain
    # (util.rs:240), so they see provider-raw weight/market_value
    df = apply_security_rules(df)

    # C2–C7 — guarded cast chain + always-on name cleanup, one projection
    casts: dict[str, F.Column] = {}
    if isinstance(_field_type(df, "weight"), T.StringType):
        casts["weight"] = percent_to_double(F.col("weight"))
    if isinstance(_field_type(df, "date"), T.TimestampType) or isinstance(
        _field_type(df, "date"), T.TimestampNTZType
    ):
        casts["date"] = F.to_date(F.col("date"))
    mv_type = _field_type(df, "market_value")
    if isinstance(mv_type, T.StringType):
        casts["market_value"] = currency_to_long(F.col("market_value"))
    elif isinstance(mv_type, T.DoubleType):
        casts["market_value"] = F.col("market_value").cast("long")
    if isinstance(_field_type(df, "shares"), T.StringType):
        casts["shares"] = thousands_to_long(F.col("shares"))
    # C6/C7 are unconditional in the reference (util.rs:292-429): a
    # frame without ticker/company fails there; we require them too.
    for required in ("ticker", "company"):
        if required not in df.columns:
            raise ValueError(f"normalize: required column '{required}' missing")
    casts["ticker"] = clean_ticker(F.col("ticker"))
    df = df.withColumns(casts)
    df = clean_company_df(df, "company")

    # P4 — drop rows whose date failed to parse (util.rs:434)
    if "date" in df.columns:
        df = df.filter(F.col("date").isNotNull())

    # C8 — derive share_price when absent but market_value present
    if "share_price" not in df.columns and "market_value" in df.columns:
        df = df.withColumn(
            "share_price", derive_share_price(F.col("market_value"), F.col("shares"))
        )

    # C9 — dtype repair
    df = repair_dtypes(df)

    # P1 — canonical projection (util.rs:478-494)
    if "share_price" in df.columns:
        return df.select(CANONICAL_COLS)
    if df.columns != SHORT_COLS:
        return df.select(SHORT_COLS)
    return df
