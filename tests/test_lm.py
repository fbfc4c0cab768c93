"""Stupid Backoff LM: planted-corpus semantics (every branch hand-checked)
plus the scale-shape plan assertions (vocab broadcast, model join keyed on
the pair, no window anywhere)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from isimip_qa_spark.queries.lm import (
    BACKOFF,
    Q,
    lm_bigram_top,
    oov_floor_lp,
    ppl_stupid_backoff,
)


def _q(x: float) -> float:
    # round-half-away-from-zero, matching Spark/DuckDB round()
    v = x * Q
    return math.floor(v + 0.5) / Q if v >= 0 else math.ceil(v - 0.5) / Q


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Model half (even doc_id): "a b c", "a b a" → uni a:3 b:2 c:1 (N=6),
    big (a,b):2 (b,c):1 (b,a):1. Odd docs exercise seen-bigram, backoff
    (unseen pair of in-vocab words) and OOV branches."""
    d = tmp_path_factory.mktemp("lmcorpus")
    pd.DataFrame(
        {
            "doc_id": [0, 2, 1, 3],
            "text": ["a b c", "a b a", "b c d", "c a"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [5, 5, 5, 3],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_planted_scores(spark, corpus_dir):
    got = {
        r["doc_id"]: r
        for r in ppl_stupid_backoff(spark, corpus_dir).collect()
    }
    assert set(got) == {0, 1, 2, 3}

    # d1 "b c d": uni(b)=2/6, bigram (b,c)=1/2, (c,d) → d is OOV
    lp1 = _q(math.log(2 / 6)) + _q(math.log(1 / 2)) + oov_floor_lp(6)
    # d3 "c a": uni(c)=1/6, (c,a) unseen but a in vocab → 0.4 * 3/6
    lp3 = _q(math.log(1 / 6)) + _q(math.log(BACKOFF * 3 / 6))
    # d0 "a b c" (model half): uni(a)=3/6, (a,b)=2/3, (b,c)=1/2
    lp0 = _q(math.log(3 / 6)) + _q(math.log(2 / 3)) + _q(math.log(1 / 2))

    assert got[1]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == round(lp1 / 3, 6)
    assert got[3]["avg_logprob"] == round(lp3 / 2, 6)
    assert got[0]["avg_logprob"] == round(lp0 / 3, 6)
    assert got[1]["ppl"] == round(math.exp(-lp1 / 3), 6)
    # OOV floor dominates: the OOV doc must be the most perplexed
    assert got[1]["ppl"] > got[3]["ppl"] > 1.0


def test_bigram_top(spark, corpus_dir):
    rows = lm_bigram_top(spark, corpus_dir).collect()
    # trained on the model half only; ties broken lexicographically
    assert [(r["w1"], r["w2"], r["cb"]) for r in rows] == [
        ("a", "b", 2),
        ("b", "a", 1),
        ("b", "c", 1),
    ]


def test_scoring_plan_shape(spark, sf_dir):
    plan = (
        ppl_stupid_backoff(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # vocab lookups + corpus-total are broadcast; only the bigram-model
    # join may shuffle — and nothing here needs a window or a global sort
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastHashJoin") >= 3
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_oov_floor_below_all_in_vocab():
    """The floor invariant that a fixed constant broke at N > 0.4·e^16:
    at ANY corpus size, OOV scores strictly below the worst possible
    in-vocab score (the backoff branch at count 1)."""
    for n in (6, 10**6, 10**9, 10**12):
        worst_in_vocab = _q(math.log(BACKOFF * 1 / n))
        assert oov_floor_lp(n) < worst_in_vocab


def test_bucketed_model_scoring_join(spark, sf_dir):
    """The lm.py scale claim: a model PERSISTED bucketed by (w1, w2) joins
    the (unbucketed) position stream with an exchange on the STREAM side
    only — the model side is read pre-partitioned. One-sided bucketing is
    the realistic scoring shape (the stream is the arriving corpus; only
    the model is a managed artifact)."""
    from isimip_qa_spark.queries.lm import _big, _toks

    big = _big(_toks(spark, sf_dir, model_half=True))
    spark.sql("DROP TABLE IF EXISTS lm_model_b")
    (
        big.write.bucketBy(8, "w1", "w2")
        .sortBy("w1", "w2")
        .mode("overwrite")
        .saveAsTable("lm_model_b")
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        stream = _toks(spark, sf_dir, model_half=False).select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("w2"),
                )
            ).alias("p"),
        ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        j = stream.join(spark.table("lm_model_b"), ["w1", "w2"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly one exchange: the stream side; the bucketed model scan
        # feeds the join directly
        assert plan.count("Exchange hashpartitioning") == 1
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS lm_model_b")
