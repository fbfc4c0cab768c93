"""Gopher n-gram CHARACTER repetition rules (top-{2,3,4}-gram and
dup-{5,10}-gram char fractions): hand-computed planted values, the
zero-shuffle plan shape, and edge cases (short docs, all-identical docs,
coverage clipping at 1.0)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from isimip_qa_spark.functions import textstats as ts


def _frame(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def _cols(text):
    nch = F.length(text).cast("long")

    def frac(cov):
        return F.least(
            F.lit(1.0),
            F.when(nch > 0, cov.cast("double") / nch.cast("double"))
            .otherwise(F.lit(0.0)),
        )

    return [
        frac(ts.top_ngram_cov_expr(text, 2)).alias("top2"),
        frac(ts.top_ngram_cov_expr(text, 3)).alias("top3"),
        frac(ts.dup_ngram_chars_expr(text, 5)).alias("dup5"),
    ]


def test_top_ngram_planted_values(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b" ×3,
    # cov = 3·3 = 9, text len 11
    # "x y z": 2-grams all unique → top count 1, longest gram cov = 3
    df = _frame(spark, ["a b a b a b", "x y z"])
    out = {r["doc_id"]: r for r in
           df.select("doc_id", *_cols(F.col("text"))).collect()}
    assert math.isclose(out[0]["top2"], 9 / 11)
    assert math.isclose(out[1]["top2"], 3 / 5)  # "x y" and "y z" tie on
    # count=1 and cov=3 — first in sorted order kept, same value either way


def test_dup_ngram_counts_all_occurrences_and_clips(spark):
    # "w w w w w w w w": 5-grams = 4 × "w w w w w" (len 9) → dup chars
    # = 4·9 = 36 > len 15 → clipped to 1.0
    # clean doc: no duplicated 5-gram → 0.0
    df = _frame(spark, ["w w w w w w w w",
                        "the quick brown fox jumps over lazy dogs"])
    out = {r["doc_id"]: r for r in
           df.select("doc_id", *_cols(F.col("text"))).collect()}
    assert out[0]["dup5"] == 1.0
    assert out[1]["dup5"] == 0.0


def test_short_and_empty_docs_zero(spark):
    # fewer tokens than n → empty gram array → 0 coverage; empty text → 0.0
    df = _frame(spark, ["", "single", "two words", "a b c d"])
    for r in df.select("doc_id", *_cols(F.col("text"))).collect():
        assert r["top3"] == 0.0 or r["doc_id"] == 3  # only 4-token doc has 3-grams
        assert r["dup5"] == 0.0


def test_tie_break_prefers_larger_coverage(spark):
    # "aa b aa b cc": 2-grams = [aa b, b aa, aa b, b cc] → "aa b" ×2 wins
    # with cov 2·4 = 8 over "b aa"/"b cc" ×1
    df = _frame(spark, ["aa b aa b cc"])
    r = df.select(*_cols(F.col("text"))).first()
    assert math.isclose(r["top2"], 8 / 12)


def test_plan_has_no_exchange(spark):
    # per-row folds: the whole query is scan → project; any Exchange means
    # the zero-shuffle contract broke
    from isimip_qa_spark.queries.webtext import repetition_ngram_rules

    df = repetition_ngram_rules(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
