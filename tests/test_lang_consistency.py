"""Windowed language consistency: analytic agreement fractions on planted
pure, spliced, and near-threshold documents, plus NULL-text propagation."""

from __future__ import annotations

import pytest

from isimip_qa_spark.functions.langid import LANG_STOPWORDS
from isimip_qa_spark.queries.webtext import lang_consistency

EN = " ".join(LANG_STOPWORDS["en"])  # 10 tokens = exactly one window
DE = " ".join(LANG_STOPWORDS["de"])
DE5 = " ".join(LANG_STOPWORDS["de"][:5])

DOCS = [
    # (doc_id, text): windows of LANG_WIN=10 tokens
    (0, f"{EN} {EN}"),  # 2 en windows, doc en → agree 2/2
    (1, f"{EN} {DE}"),  # spliced: windows [en, de]; doc-level scores TIE
    #                     10-10 → 'en' (first in LANG_ORDER) → agree 1/2
    (2, "xx yy zz qq rr"),  # no stopwords anywhere ("y" alone would be a
    #                         Spanish stopword!): window + doc both
    #                    default to 'en' → agree 1/1
    (3, None),  # NULL text → every derived column NULL
    (4, f"{EN} {EN} {DE5}"),  # windows [en, en, de] (the 5-token tail
    #                           window is german); doc 20-5 → en → 2/3
]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("langc"))
    spark.createDataFrame(
        [(i, t, "en", "s", 1) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_agreement_analytic(spark, planted_dir):
    got = {r["doc_id"]: r for r in lang_consistency(spark, planted_dir).collect()}
    assert (got[0]["doc_lang"], got[0]["n_windows"], got[0]["n_agree"]) == ("en", 2, 2)
    assert got[0]["agree_frac"] == 1.0 and not got[0]["mixed_lang_doc"]

    # spliced doc: tie at doc level resolves to en, half the windows agree
    assert (got[1]["doc_lang"], got[1]["n_windows"], got[1]["n_agree"]) == ("en", 2, 1)
    assert got[1]["agree_frac"] == 0.5 and got[1]["mixed_lang_doc"]

    assert (got[2]["doc_lang"], got[2]["n_windows"], got[2]["n_agree"]) == ("en", 1, 1)
    assert not got[2]["mixed_lang_doc"]

    # near-threshold: 2/3 agree → 0.666667 < 0.7 → mixed
    assert (got[4]["doc_lang"], got[4]["n_windows"], got[4]["n_agree"]) == ("en", 3, 2)
    assert got[4]["agree_frac"] == round(2 / 3, 6) and got[4]["mixed_lang_doc"]


def test_null_text_propagates(spark, planted_dir):
    got = {r["doc_id"]: r for r in lang_consistency(spark, planted_dir).collect()}
    r = got[3]
    assert r["doc_lang"] is None and r["n_windows"] is None
    assert r["n_agree"] is None and r["agree_frac"] is None
    assert r["mixed_lang_doc"] is None


def test_plan_is_scan_only(spark, planted_dir):
    plan = (
        lang_consistency(spark, planted_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pure column expressions: ZERO shuffles (no terminal sort — per-doc
    # outputs must not globally sort the corpus), no Python anywhere
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1
