"""Word-unigram Shannon entropy filter: analytic answers on planted docs,
cross-check vs an independent pandas/collections.Counter oracle, and the
zero-shuffle plan contract (pure projection — no Exchange)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from isimip_qa_spark.functions.textstats import word_entropy_expr
from isimip_qa_spark.queries.webtext import ENTROPY_MIN, word_entropy

# (text, analytic entropy in bits)
ANALYTIC = [
    ("a a a a", 0.0),
    ("a b a b", 1.0),
    ("a b c d", 2.0),
    ("d c b a d c b a", 2.0),
    ("a", 0.0),
    ("", 0.0),  # split('', ' ') -> [''] : one token, zero entropy
    ("a a b", math.log2(3) - 2.0 / 3.0),
    ("the quick brown fox the quick brown fox jumps", None),  # oracle below
]


def _py_entropy(text: str) -> float:
    toks = text.split(" ")
    n = len(toks)
    counts = Counter(toks).values()
    return math.log2(n) - sum(c * math.log2(c) for c in counts) / n


@pytest.fixture(scope="module")
def planted(spark):
    rows = [(i, t) for i, (t, _) in enumerate(ANALYTIC)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_analytic_and_counter_oracle(planted):
    got = {
        r["doc_id"]: r["h"]
        for r in planted.select(
            "doc_id", word_entropy_expr(F.col("text")).alias("h")
        ).collect()
    }
    for i, (text, expect) in enumerate(ANALYTIC):
        want = _py_entropy(text) if expect is None else expect
        assert got[i] == pytest.approx(round(want, 6), abs=1e-6), (i, text)


def test_keep_flag_matches_rounded_threshold(planted):
    rows = planted.select(
        word_entropy_expr(F.col("text")).alias("h"),
        (word_entropy_expr(F.col("text")) >= F.lit(ENTROPY_MIN)).alias("ok"),
    ).collect()
    for r in rows:
        assert r["ok"] == (r["h"] >= ENTROPY_MIN)


def test_plan_is_pure_projection(spark, sf_dir):
    plan = (
        word_entropy(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # JVM-side fold, no Arrow crossing


def test_sf_rows_and_range(spark, sf_dir):
    out = word_entropy(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == docs
    for r in out:
        assert 0.0 <= r["word_entropy"] <= 20.0
