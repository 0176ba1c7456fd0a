"""BPE merge learning / segmentation (operators/bpe.py) vs an
independent pure-Python reference implementing the classic algorithm
(Sennrich et al. 2016: pair counts over a word-frequency vocabulary,
greedy left-to-right non-overlapping merge application)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ark_invest_api_rust_data_spark.operators.bpe import (
    bpe_learn,
    bpe_merge_table,
    bpe_segment,
)


def ref_bpe(texts: list[str], n_merges: int):
    """Plain-Python BPE: same word regex, same tie-break (count desc,
    then the bracket-delimited pair string ascending)."""
    freq: Counter = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            freq[w] += 1
    vocab = {tuple(w): c for w, c in freq.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], f"<{kv[0][0]}> <{kv[0][1]}>")
        )
        merges.append((step, l, r, cnt))
        new: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges


def ref_segment(text: str, merges) -> tuple[int, int]:
    """(n_words, n_bpe_tokens) applying merges in learned order."""
    words = re.findall(r"[a-z0-9]+", text.lower())
    total = 0
    for w in words:
        syms = list(w)
        for _, l, r, _c in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return len(words), total


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_learn_matches_reference(spark):
    texts = [
        "the theme of these theses is the same theme",
        "low lower lowest newer newest wide wider widest",
        "aaa aaaa aa a baa abba",
    ]
    got = bpe_learn(_df(spark, texts), n_merges=6)
    assert got == ref_bpe(texts, 6)


def test_bpe_learn_tie_break_is_lexicographic(spark):
    # 'ab' and 'cd' both appear twice: the smaller delimited pair
    # string '<a> <b>' must win the first merge
    texts = ["ab ab cd cd"]
    got = bpe_learn(_df(spark, texts), n_merges=2)
    assert got[0][1:3] == ("a", "b")
    assert got == ref_bpe(texts, 2)


def test_bpe_overlapping_run_merges_left_to_right(spark):
    # 'aaa': greedy non-overlapping gives ['aa', 'a'] after merge
    # (a, a) — the pair count of step 2 must reflect that exactly
    texts = ["aaa aaa"]
    got = bpe_learn(_df(spark, texts), n_merges=3)
    assert got == ref_bpe(texts, 3)
    assert got[0][1:3] == ("a", "a")


def test_bpe_exhausts_pairs_and_validates(spark):
    # one distinct 2-char word: after one merge no pairs remain —
    # learn must stop early instead of erroring
    texts = ["ab ab"]
    got = bpe_learn(_df(spark, texts), n_merges=5)
    assert got == ref_bpe(texts, 5)
    assert len(got) == 1
    with pytest.raises(ValueError):
        bpe_learn(_df(spark, texts), n_merges=0)
    # single-char words only: no pairs at all, zero merges
    assert bpe_learn(_df(spark, ["a b c a"]), n_merges=3) == []


def test_bpe_merge_table_schema(spark):
    t = bpe_merge_table(_df(spark, ["abab abab cdcd"]), n_merges=3)
    assert [f.name for f in t.schema.fields] == [
        "step", "left_sym", "right_sym", "pair_count",
    ]
    assert t.count() == 3


def test_bpe_segment_matches_reference(spark):
    texts = [
        "the theme of these theses is the same theme",
        "low lower lowest newer newest wide wider widest",
        "",
        "aaa AAAA aa",
    ]
    df = _df(spark, texts)
    merges = bpe_learn(df, n_merges=5)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_segment(df, merges).collect()
    }
    want = {i: ref_segment(t, merges) for i, t in enumerate(texts)}
    assert got == want
    # empty text: present with zero counts, not dropped
    assert got[2] == (0, 0)


_spark_cache = None


def _get_spark():
    global _spark_cache
    if _spark_cache is None:
        from ark_invest_api_rust_data_spark.session import get_spark

        _spark_cache = get_spark(master="local[4]", shuffle_partitions=4)
    return _spark_cache


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="ab1", min_size=1, max_size=5),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_bpe_property_matches_reference(corpus, n_merges):
    spark = _get_spark()
    df = _df(spark, corpus)
    merges = bpe_learn(df, n_merges=n_merges)
    assert merges == ref_bpe(corpus, n_merges)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_segment(df, merges).collect()
    }
    assert got == {i: ref_segment(t, merges) for i, t in enumerate(corpus)}
