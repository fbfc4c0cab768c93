"""Cross-source shingle-overlap matrix and per-source language entropy:
analytic answers on a planted 3-source corpus, and the broadcast-join plan
contract for the size lookups."""

from __future__ import annotations

import pytest

from isimip_qa_spark.queries.datasheet import source_lang_entropy, source_overlap

# k=3 shingles: "a b c d" -> {"a b c", "b c d"}; a <3-token doc folds to one
# clamped gram (fingerprint.shingles_expr contract)
DOCS = [
    # (doc_id, text, lang, source)
    (0, "a b c d", "en", "srcA"),  # shingles {abc, bcd}
    (1, "a b c", "en", "srcA"),  # {abc} (dup within source: no effect)
    (2, "a b c", "de", "srcB"),  # {abc}
    (3, "x y z", "de", "srcB"),  # {xyz}
    (4, "p q r", "fr", "srcC"),  # {pqr}
]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srcds"))
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_overlap_analytic(spark, planted_dir):
    rows = source_overlap(spark, planted_dir).collect()
    got = {(r["source_a"], r["source_b"]): (r["shared"], r["jaccard"]) for r in rows}
    # srcA={abc,bcd} srcB={abc,xyz}: shared 1, J = 1/(2+2-1)
    assert got == {("srcA", "srcB"): (1, round(1 / 3, 6))}


def test_overlap_single_scan_no_join(spark, planted_dir):
    plan = (
        source_overlap(spark, planted_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole matrix comes from ONE corpus pass: one scan, one
    # corpus-scale exchange (by shingle hash), zero joins — sizes attach
    # via windows over the tiny (a, b) aggregate, whose exchanges are
    # keyed on source columns (catalog-sized, not corpus-sized)
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert plan.count("hashpartitioning(k#") == 1


def test_lang_entropy_analytic(spark, planted_dir):
    rows = source_lang_entropy(spark, planted_dir).collect()
    got = {r["source"]: r for r in rows}
    assert got["srcA"]["n_docs"] == 2 and got["srcA"]["lang_entropy"] == 0.0
    assert got["srcB"]["n_langs"] == 1  # both srcB docs are de
    assert got["srcC"]["n_docs"] == 1 and got["srcC"]["lang_entropy"] == 0.0
    for r in rows:
        assert r["mixed_lang"] == (r["lang_entropy"] >= 1.5)


def test_lang_entropy_nonuniform(spark):
    """Non-dyadic case exercising the s-term: 2 de + 1 en gives
    H = log2(3) − 2/3 ≈ 0.918296 — a value where a sign or divisor error
    in s/n cannot cancel (unlike the uniform/degenerate cases above)."""
    import math
    import tempfile

    rows = [(i, "t", lg, "srcN", 1) for i, lg in enumerate(["de", "de", "en"])]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as out:
        d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
        got = source_lang_entropy(spark, out).collect()[0]
    assert got["lang_entropy"] == round(math.log2(3) - 2.0 / 3.0, 6)
    assert not got["mixed_lang"]


def test_lang_entropy_mixed_flag(spark):
    rows = [(i, "t", lg, "srcM", 1) for i, lg in enumerate("en de fr zh".split())]
    rows += [(10 + i, "t", "en", "srcP", 1) for i in range(4)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as out:
        d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
        got = {r["source"]: r for r in source_lang_entropy(spark, out).collect()}
    assert got["srcM"]["lang_entropy"] == 2.0 and got["srcM"]["mixed_lang"]
    assert got["srcP"]["lang_entropy"] == 0.0 and not got["srcP"]["mixed_lang"]
