"""Security-master rewrite rules (SURVEY.md §2 R1–R12).

The reference registry (/root/reference/src/util/format/ticker.rs)
folds 11 per-security fixups over the frame. The core primitive,
``get_expr`` (ticker.rs:48-72), is subtle: a rule that matches on
``company`` writes the new value to BOTH ticker and company, and the
generated expression ORDER matters because one of the two assignments
overwrites the condition column — each with_columns step must evaluate
its condition against the PRE-step value. Spark's ``withColumns``
(plural) has exactly those semantics: all expressions see the input
row, so each step is one withColumns call.

Rules are declarative data; ``apply_security_rules`` compiles them to a
chain of narrow projections — all built-in when/otherwise, fully
codegen'd, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Rule:
    """One with_columns step: when(match_col == match_val) then set
    each target column to its new value, else keep."""

    match_col: str  # column the condition tests ("company" or "ticker")
    match_val: str  # literal the condition compares against
    sets: tuple[tuple[str, str], ...]  # (target_col, new_value) pairs


def _sync(match_val: str, new: str) -> Rule:
    """get_expr('company', …): set BOTH ticker and company."""
    return Rule("company", match_val, (("ticker", new), ("company", new)))


def _set_ticker(match_val: str, new: str) -> Rule:
    return Rule("company", match_val, (("ticker", new),))


def _set_company(match_val: str, new: str) -> Rule:
    return Rule("company", match_val, (("company", new),))


# Ordered exactly as format::Ticker::all iterates the enum
# (/root/reference/src/util/format/ticker.rs:10-22,25-30). Each Rule is
# one with_columns pass; multi-pass rules (ARKW, XYZ, CASH_USD) stay
# multiple entries to preserve intra-rule sequencing.
SECURITY_RULES: list[Rule] = [
    # ARKW (R2): both bitcoin holdco spellings → ARKB (ticker+company)
    _sync("ARK BITCOIN ETF HOLDCO (ARKW)", "ARKB"),
    _sync("ARK BITCOIN ETF HOLDCO (ARKF)", "ARKB"),
    # CRLC (R3)
    _set_ticker("CIRCLE INTERNET GROUP", "CRLC"),
    # CRWV (R4)
    _set_ticker("COREWEAVE", "CRWV"),
    # DKNG (R9): company artifact of the C7 " DR" strip
    _set_company("AFTKINGS", "DRAFTKINGS"),
    # ETOR (R5)
    _set_ticker("ETORO GROUP", "ETOR"),
    # MKFG (R6)
    _set_ticker("MARKFORGEDG", "MKFG"),
    # LUNR (R7)
    _set_ticker("INTUITIVE MACHINES", "LUNR"),
    # XYZ (R10): two sequential passes, order preserved
    _set_ticker("BLOCK", "XYZ"),
    _set_ticker("Block", "XYZ"),
    # CASH_USD (R11): four spellings, each a full sync pass
    _sync("Cash & Cash Equivalents", "CASH_USD"),
    _sync("CASH & CASH EQUIVALENTS", "CASH_USD"),
    _sync("GOLDMAN FS TRSY OBLIG INST 468", "CASH_USD"),
    _sync("Cash & Other", "CASH_USD"),
    # TSM (R12): 'TMSC' typo is golden-tested upstream — do NOT fix
    _set_company("TAIWANMICONDUCTORSP", "TMSC"),
    # RKLB (R8): the reference runs both in one with_columns pass; the
    # first touches only ticker, so two sequential passes are
    # equivalent ('ROCKET LAB USA' must not gain a ticker — preserved).
    Rule("company", "ROCKET LAB", (("ticker", "RKLB"),)),
    Rule("company", "ROCKET LAB USA", (("company", "ROCKET LAB"),)),
]


def apply_security_rules(df: DataFrame, rules: list[Rule] | None = None) -> DataFrame:
    """R1 framework: fold every rule over the frame, one withColumns
    pass per rule (all assignments in a pass read pre-pass values)."""
    if rules is None:
        rules = SECURITY_RULES
    if "company" not in df.columns or "ticker" not in df.columns:
        return df
    for rule in rules:
        cond = F.col(rule.match_col) == F.lit(rule.match_val)
        df = df.withColumns(
            {
                target: F.when(cond, F.lit(new)).otherwise(F.col(target))
                for target, new in rule.sets
            }
        )
    return df
