"""Property-based check of the shared sorted run-length fold
(functions/textstats._run_fold) through all three of its users — word
entropy, top-n-gram coverage, duplicate-n-gram chars — against independent
pure-Python Counter references on arbitrary unicode text. The planted tests
pin analytic values; this hammers the fold's run-transition/sentinel
machinery (leading empty tokens, all-equal runs, singleton docs) that a
fixture can't enumerate."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isimip_qa_spark.functions.textstats import (
    dup_ngram_chars_expr,
    top_ngram_cov_expr,
    word_entropy_expr,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# spaces drawn often so empty tokens / repeated tokens / short docs emerge
_text = st.text(
    alphabet=st.one_of(
        st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
        ),
        st.sampled_from([" ", " ", "a", "b"]),
    ),
    max_size=40,
)


def _spark_vals(spark, values, col):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(values)], "i long, text string"
    )
    return {r["i"]: r["v"] for r in df.select("i", col.alias("v")).collect()}


def _py_grams(text: str, n: int) -> list[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _py_entropy(text: str) -> float:
    toks = text.split(" ")
    n = len(toks)
    s = sum(c * math.log2(c) for c in Counter(toks).values())
    return round(math.log2(n) - s / n, 6)


def _py_top_cov(text: str, n: int) -> int:
    counts = Counter(_py_grams(text, n))
    if not counts:
        return 0
    # the fold keeps the (count, coverage)-lexicographic max and returns
    # its coverage component
    return max((c, c * len(g)) for g, c in counts.items())[1]


def _py_dup_chars(text: str, n: int) -> int:
    return sum(
        c * len(g) for g, c in Counter(_py_grams(text, n)).items() if c >= 2
    )


@given(texts=st.lists(_text, min_size=1, max_size=10))
@_SETTINGS
def test_word_entropy_fold_vs_counter(spark, texts):
    got = _spark_vals(spark, texts, word_entropy_expr(F.col("text")))
    for i, t in enumerate(texts):
        assert got[i] == _py_entropy(t), (i, t)


@given(texts=st.lists(_text, min_size=1, max_size=10))
@_SETTINGS
def test_top_ngram_cov_fold_vs_counter(spark, texts):
    for n in (2, 3):
        got = _spark_vals(spark, texts, top_ngram_cov_expr(F.col("text"), n))
        for i, t in enumerate(texts):
            assert got[i] == _py_top_cov(t, n), (i, n, t)


@given(texts=st.lists(_text, min_size=1, max_size=10))
@_SETTINGS
def test_dup_ngram_chars_fold_vs_counter(spark, texts):
    for n in (2, 3):
        got = _spark_vals(spark, texts, dup_ngram_chars_expr(F.col("text"), n))
        for i, t in enumerate(texts):
            assert got[i] == _py_dup_chars(t, n), (i, n, t)
