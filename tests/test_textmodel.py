"""Model-shaped text operators: plan-shape and semantics gates (value
checks run through tools/check_oracles.py like every registered query)."""

from __future__ import annotations

import pandas as pd

from tests.test_plans import plan_of


def test_classifier_is_shuffle_free_scan(spark, sf_dir):
    """The classifier is ONE projected scan: no exchange, no explode, no
    Python — the 100-TB cost model the docstring claims."""
    from isimip_qa_spark.queries.textmodel import quality_classifier

    plan = plan_of(quality_classifier(spark, sf_dir))
    body = plan.split("== Physical Plan ==")[-1]
    # the only allowed exchange is the orderBy's range partitioning
    n_ex = body.count("Exchange ")
    n_range = body.count("Exchange rangepartitioning")
    assert n_ex == n_range, body
    assert "ArrowEvalPython" not in body and "BatchEvalPython" not in body
    assert "Generate" not in body  # no explode


def test_classifier_keep_is_integer_exact(spark, tmp_path):
    """keep_ml compares int64 sums — recompute the sum in pure Python over
    a tiny corpus and assert the booleans match exactly."""
    from isimip_qa_spark.functions.fingerprint import KNUTH, MOD31
    from isimip_qa_spark.queries.textmodel import (
        N_BUCKETS,
        _W_SALT,
        _W_SCALE,
        quality_classifier,
    )

    texts = ["the quick brown fox", "a b", "spark shuffles bytes not rows"]
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    docs.to_parquet(d + "/documents.parquet")

    def h31(tok: str) -> int:
        return (
            len(tok) * KNUTH
            + (ord(tok[0]) if tok else 0) * 40503
            + (ord(tok[-1]) if tok else 0)
        ) % MOD31

    def w(tok: str) -> int:
        return ((h31(tok) % N_BUCKETS) * KNUTH + _W_SALT) % MOD31 - _W_SCALE

    expect = {
        i: sum(w(t) for t in txt.split(" ")) > 0 for i, txt in enumerate(texts)
    }
    got = {
        r.doc_id: r.keep_ml
        for r in quality_classifier(spark, d).collect()
    }
    assert got == expect


def test_ngram_lm_probs_sum_to_one_per_context(spark, sf_dir):
    """For every context w1 whose bigrams all survive MIN_COUNT, the
    conditional probs must sum to exactly 1 (they share one denominator)."""
    from isimip_qa_spark.queries.textmodel import ngram_lm_train

    pdf = ngram_lm_train(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    # contexts where the filtered rows account for the whole denominator
    g = pdf.groupby("w1").agg(cnt=("cnt", "sum"), prob=("prob", "sum"))
    denom = pdf.groupby("w1")["cnt"].sum() / pdf.groupby("w1")["prob"].sum()
    full = g[abs(g["cnt"] - denom.round()) < 0.5]
    assert len(full) > 0
    assert (abs(full["prob"] - 1.0) < 1e-9).all()


def test_ngram_lm_single_token_docs_are_safe(spark, tmp_path):
    """1-token and 2-token docs: no negative-length slice errors; the one
    bigram of a repeated 2-token doc survives MIN_COUNT with prob 1."""
    import os

    from isimip_qa_spark.queries.textmodel import MIN_COUNT, ngram_lm_train

    texts = ["solo"] * 2 + ["pair bond"] * MIN_COUNT
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(d + "/documents.parquet")
    rows = ngram_lm_train(spark, d).collect()
    assert [(r.w1, r.w2, r.cnt, r.prob) for r in rows] == [
        ("pair", "bond", MIN_COUNT, 1.0)
    ]


def test_tfidf_topk_per_lang(spark, sf_dir):
    from isimip_qa_spark.queries.textmodel import TOPK_TERMS, tfidf_top_terms

    pdf = tfidf_top_terms(spark, sf_dir).toPandas()
    assert (pdf.groupby("lang").size() <= TOPK_TERMS).all()
    assert (pdf["df"] > 0).all() and (pdf["tf"] > 0).all()
