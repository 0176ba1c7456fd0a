"""Text-analysis operators for training-data pipelines (SURVEY.md §2
B31 + driver north star): token counting, quality scoring, language-ID
heuristic, document fingerprinting.

Everything is built-in expression work (split/transform/aggregate/md5)
— JVM-side, vectorized, no Python in the row path — so the operators
run at full scan speed on any corpus size; the only shuffle anywhere is
a groupBy when the caller aggregates the per-doc outputs.

Determinism contract (for the DuckDB oracles): ratios are int/int
double divisions (same operands → same IEEE result in every engine);
fingerprints are md5 hex; token hashes are 31-ary character folds in
exact int64 arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

STOPWORDS = ("a", "the")  # corpus-appropriate tiny stopword set

# BPE-ish subword segmentation: runs of lowercase, TitleCase fragments,
# digit runs, or single non-alnum marks — the pre-tokenization regex
# family GPT-2-style BPE vocabularies are trained over. Simple enough
# that Java regex (Spark) and RE2 (DuckDB oracle) agree exactly.
SUBTOKEN_RE = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]"

HASH_MOD = 4294967296  # 2^32 — token hashes are uint32 on an int64 carrier


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the oracle uses the same regex)."""
    return F.split(F.trim(text), r"\s+")


def token_hash32(tok: Column) -> Column:
    """Deterministic 32-bit token hash: fold chars with h = (h*31 +
    ascii) mod 2^32 — pure integer math, reproducible in any engine
    (DuckDB oracle uses list_reduce with the same fold)."""
    chars = F.filter(F.split(tok, ""), lambda ch: ch != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(HASH_MOD),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: token counts, uniq ratio, stopword ratio,
    char stats, a composite quality score, and an md5 fingerprint."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    uniq_ratio = n_uniq.cast("double") / n_tokens.cast("double")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    from .dedup import _spread

    n_subtokens = F.regexp_count(F.col(text_col), F.lit(SUBTOKEN_RE))
    return _spread(df).select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_subtokens.alias("n_subtokens"),
        n_uniq.alias("n_uniq"),
        F.length(F.col(text_col)).alias("n_chars"),
        (sum_len.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stopword_ratio"),
        # quality: rewards lexical diversity, penalizes stopword mass —
        # same closed-form in the oracle
        (uniq_ratio * F.lit(0.5) + (F.lit(1.0) - stop_ratio) * F.lit(0.5)).alias(
            "quality_score"
        ),
        F.md5(F.col(text_col)).alias("fingerprint"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: CJK character share → 'zh'; else English
    stopword share → 'en' / 'other'. (The synthetic corpus is one
    vocabulary, so this validates the *operator's* determinism, not
    label recovery.)"""
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    total = F.length(F.col(text_col))
    toks = tokens(F.col(text_col))
    stop_ratio = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))).cast(
        "double"
    ) / F.size(toks).cast("double")
    guess = (
        F.when(total == 0, "unknown")
        .when(cjk.cast("double") / total.cast("double") > 0.3, "zh")
        .when(stop_ratio >= 0.02, "en")
        .otherwise("other")
    )
    from .dedup import _spread

    return _spread(df).select(id_col, guess.alias("lang_guess"))


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: min 32-bit hash over each
    sliding token window, distinct-sorted — a compact signature for
    shift-robust near-dup detection. Integer math end to end.

    Cost shape: each TOKEN is char-folded once (its hash is reused by
    every window containing it); each WINDOW hash is then an 8-step
    integer fold over the token hashes. Composing from token hashes
    instead of re-folding the concatenated gram string cuts the
    expression work ~window× (measured 43s → ~3s at sf0.1). The SQL
    oracle computes the identical two-level fold."""
    from .dedup import _spread

    # token-hash array materialized as its OWN column: the gram lambda
    # references it 8×, and an inlined expression would re-evaluate the
    # whole char-fold array per reference (multi-referenced columns are
    # not inlined by CollapseProject)
    base = _spread(df).withColumn("_th", F.transform(tokens(F.col(text_col)), token_hash32))
    th = F.col("_th")

    def gram_hash(i):
        acc = F.element_at(th, i.cast("int"))
        for j in range(1, window):
            acc = (acc * F.lit(31) + F.element_at(th, (i + j).cast("int"))) % F.lit(HASH_MOD)
        return acc

    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(th) - F.lit(window - 1), F.lit(1))),
        gram_hash,
    )
    return base.select(
        id_col,
        F.array_sort(F.array_distinct(hashes)).alias("fingerprints"),
        F.array_min(hashes).alias("min_fingerprint"),
    )
