"""Distributed BPE vocabulary learning (Sennrich et al. 2016) — the
tokenizer-training side of a training-data pipeline, at corpus scale.

The reference implements no tokenizer training (SURVEY.md Part B
evidence-of-absence) — this is part of the Part-B LLM-corpus surface
(B31 family), built Spark-first:

* word-frequency table: ONE shuffle, O(distinct words) after map-side
  combine — the corpus is never re-scanned again, every merge
  iteration works on the (word, freq) vocabulary, which is orders of
  magnitude smaller than the corpus (the classic BPE trick, here it is
  also what makes the distributed shape linear);
* per merge step: pair counting is an explode + partial/final
  aggregation whose shuffle is O(distinct pairs); choosing the best
  pair is a ONE-ROW driver crossing (same bounded-crossing discipline
  as the k-means centroid updates, clustering.py); applying the merge
  is a narrow per-row string replace — no shuffle;
* determinism: counts are exact int64 sums; ties break on the pair's
  delimited string ascending (binary ASCII collation in both engines),
  so the learned merge table is bit-reproducible and the whole
  learning loop has a FULL SQL oracle (plans/llm.py unrolls the merge
  steps as CTE blocks, the same technique as the Lloyd's oracle).

Symbol sequences are stored as bracket-delimited spaced strings
(``"<a> <b> <c>"``): a merge is then a plain non-overlapping
left-to-right ``replace(seq, '<a> <b>', '<ab>')`` — identical
semantics in Spark and DuckDB — and the brackets make the replace
boundary-safe (``"<xa> <b>"`` can never match ``'<a> <b>'``; words
are ``[a-z0-9]+`` so brackets never occur inside a symbol). The
greedy left-to-right non-overlapping scan is exactly the reference
BPE implementation's behavior on its space-joined symbol strings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

WORD_RE = "[a-z0-9]+"


def _word_seq(word) -> "F.Column":
    """word → bracket-delimited spaced char sequence: 'ab' → '<a> <b>'."""
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.concat_ws(
        " ", F.transform(chars, lambda c: F.concat(F.lit("<"), c, F.lit(">")))
    )


def _adjacent_pairs(seq) -> "F.Column":
    """spaced symbol string → array of adjacent-pair strings
    ('<a> <b> <c>' → ['<a> <b>', '<b> <c>']); empty for 1-symbol
    words (guarded: Spark's sequence(1, 0) counts DOWN, not empty)."""
    syms = F.split(seq, " ")
    return F.when(
        F.size(syms) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat(
                F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_freq_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(seq, freq) vocabulary: lowercase ``[a-z0-9]+`` words across the
    corpus, counted, each as its initial character-level symbol
    sequence. The one corpus-scale aggregation of BPE learning."""
    from .dedup import _spread

    words = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    ).alias("word")
    return (
        # spread BEFORE the explode: the regex scan is the expensive
        # part and must not serialize on a single-split file scan
        _spread(df).select(words)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(_word_seq(F.col("word")).alias("seq"), "freq")
    )


def bpe_learn(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns
    ``[(step, left, right, pair_count), ...]`` in learned order
    (step 1-based; left/right are raw symbols, brackets stripped).

    Each step: count adjacent symbol pairs over the (word, freq)
    vocabulary, take the most frequent (ties → lexicographically
    smallest delimited pair string), fuse it everywhere. The vocabulary
    frame is cut per step (small: two columns per distinct word) so
    lineage stays flat across iterations; the cut tier follows
    ``checkpoint_dir`` (operators/persistence.py) — a reliable path
    makes an n_merges-step learn survive executor loss."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    from .persistence import Materializer

    mat = Materializer(df.sparkSession, checkpoint_dir)
    cur = mat.cut(word_freq_table(df, text_col=text_col))
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            cur.select(F.explode(_adjacent_pairs(F.col("seq"))).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )  # bounded driver crossing: one (pair, cnt) row per merge
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        lsym, rsym = (s[1:-1] for s in pair.split(" "))
        merges.append((step, lsym, rsym, cnt))
        merged = f"<{lsym}{rsym}>"
        nxt = mat.cut(
            cur.withColumn(
                "seq", F.replace(F.col("seq"), F.lit(pair), F.lit(merged))
            )
        )
        mat.release(cur)  # superseded step
        cur = nxt
    mat.release(cur)
    return merges


def bpe_merge_table(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """``bpe_learn`` as a DataFrame — (step, left, right, pair_count),
    the probe/export surface."""
    spark = df.sparkSession
    rows = bpe_learn(df, n_merges=n_merges, text_col=text_col)
    return spark.createDataFrame(
        rows, "step int, left_sym string, right_sym string, pair_count long"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges to every document: per doc, each word is
    exploded to characters and the merges are replayed IN LEARNED ORDER
    (a chain of ``n_merges`` narrow string replaces — zero shuffle),
    yielding (id, n_words, n_bpe_tokens): the post-BPE token count a
    training pipeline budgets sequences with. ``merges`` accepts
    ``bpe_learn`` output or bare (left, right) tuples."""
    pairs = [
        (m[1], m[2]) if len(m) >= 3 else (m[0], m[1]) for m in merges
    ]
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)

    def apply_merges(word):
        seq = _word_seq(word)
        for left, right in pairs:
            seq = F.replace(
                seq, F.lit(f"<{left}> <{right}>"), F.lit(f"<{left}{right}>")
            )
        return F.size(F.split(seq, " "))

    n_bpe = F.aggregate(
        F.transform(words, apply_merges),
        F.lit(0).cast("long"),
        lambda acc, n: acc + n,
    )
    from .dedup import _spread

    return _spread(df).select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        n_bpe.alias("n_bpe_tokens"),
    )
