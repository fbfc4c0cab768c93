"""DSIR importance resampling (queries/dsir.py): model shape, planted
target-domain monotonicity, determinism, and plan shapes."""

from __future__ import annotations

import math

import pytest

from isimip_qa_spark.queries.dsir import (
    ALPHA,
    B,
    SELECT_K,
    TARGET_MOD,
    dsir_logratio,
    dsir_select,
    dsir_weights,
)

SF = "/root/testdata/sf0.01"


def test_logratio_model_shape_and_totals(spark):
    rows = dsir_logratio(spark, SF).collect()
    assert len(rows) == B
    assert sorted(r["bucket"] for r in rows) == list(range(B))
    # every logratio is on the dyadic 1/1024 grid (exact-sum contract)
    for r in rows:
        assert r["logratio"] == round(r["logratio"] * 1024) / 1024
    # smoothed ratios are bounded by the all-mass-in-one-bucket extremes
    t_tot = sum(r["target_cnt"] for r in rows)
    r_tot = sum(r["raw_cnt"] for r in rows)
    hi = math.log((t_tot + ALPHA) / (t_tot + ALPHA * B)) - math.log(
        ALPHA / (r_tot + ALPHA * B)
    )
    assert all(abs(r["logratio"]) <= hi + 1 for r in rows)


def test_weights_cover_raw_pool_only_and_are_deterministic(spark):
    df = dsir_weights(spark, SF)
    rows = df.collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == docs - sum(
        1 for _ in range(0, docs, TARGET_MOD)
    )  # raw pool = all docs minus the target carve-out
    assert all(r["doc_id"] % TARGET_MOD != 0 for r in rows)
    again = {r["doc_id"]: r["logweight"] for r in df.collect()}
    assert all(again[r["doc_id"]] == r["logweight"] for r in rows)


def test_planted_target_similarity_orders_weights(spark, tmp_path):
    """Docs that share the target sample's vocabulary must out-score docs
    that don't — the property DSIR exists to deliver."""
    target_text = "the quick brown fox jumps over the lazy dog again and again"
    similar = "a quick brown fox jumps over a lazy dog every day"
    dissimilar = "zzqx wvut ponm lkji hgfe dcba zyxw vuts rqpo nmlk"
    rows = []
    for i in range(60):
        if i % TARGET_MOD == 0:
            t = target_text
        elif i % 2 == 0:
            t = similar
        else:
            t = dissimilar
        rows.append((i, t, "en", "planted", len(t)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    w = {
        r["doc_id"]: r["logweight"]
        for r in dsir_weights(spark, str(tmp_path)).collect()
    }
    sim_scores = [v for k, v in w.items() if k % 2 == 0]
    dis_scores = [v for k, v in w.items() if k % 2 == 1]
    assert min(sim_scores) > max(dis_scores)
    # and the Gumbel-top-k resample prefers the similar docs
    picked = dsir_select(spark, str(tmp_path)).collect()
    k = min(SELECT_K, len(w))
    assert len(picked) == k
    n_sim = sum(1 for r in picked if r["doc_id"] % 2 == 0)
    assert n_sim == len(sim_scores)  # all similar docs survive the resample


def test_kernel_bit_identical_to_expression_path(spark):
    """The vectorized scoring kernel must produce the exact doubles the
    pure-expression fold produces (dyadic addends ⇒ order-free sums)."""
    from isimip_qa_spark.queries.dsir import _weights_expr_df

    fast = {
        (r["doc_id"], r["n_grams"], r["logweight"])
        for r in dsir_weights(spark, SF).collect()
    }
    slow = {
        (r["doc_id"], r["n_grams"], r["logweight"])
        for r in _weights_expr_df(spark, SF).collect()
    }
    assert fast == slow


def test_scoring_plan_is_shuffle_free_and_select_is_topk(spark):
    wplan = (
        dsir_weights(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in wplan  # zero-shuffle scoring fold
    splan = (
        dsir_select(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in splan  # per-task top-K, no global sort


def test_kl_report_shows_selection_moves_toward_target(spark, tmp_path):
    """On a corpus where half the raw pool matches the target vocabulary,
    Gumbel-top-K keeps the matching half — so the selected distribution
    must sit strictly closer to the target than the raw pool does."""
    from isimip_qa_spark.queries.dsir import SELECT_K, dsir_kl

    target_text = "the quick brown fox jumps over the lazy dog again and again"
    similar = "a quick brown fox jumps over a lazy dog every day"
    dissimilar = "zzqx wvut ponm lkji hgfe dcba zyxw vuts rqpo nmlk"
    rows = []
    # raw pool must EXCEED the resample size or selection is vacuous
    # (top-K of 54 docs with K=200 keeps everything)
    n_docs = 3 * SELECT_K
    for i in range(n_docs):
        if i % TARGET_MOD == 0:
            t = target_text
        elif i % 2 == 0:
            t = similar
        else:
            t = dissimilar
        rows.append((i, t, "en", "planted", len(t)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    r = dsir_kl(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0]["kl_selected"] < r[0]["kl_raw"]


@pytest.mark.parametrize(
    "name", ["dsir_logratio", "dsir_weights", "dsir_select", "dsir_kl"]
)
def test_registered_with_oracle(name):
    from isimip_qa_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    assert name in QUERIES and name in ORACLES
