"""script_profile + ocr_artifact_rules (queries/scriptid.py): every signal
recomputed by a pure-Python reference, oracle parity at sf0.001, and the
zero-shuffle / zero-Python plan shape."""

from __future__ import annotations

import math

from isimip_qa_spark.queries.scriptid import (
    _HOMO_DST,
    _HOMO_SRC,
    _HYPH_DEN,
    _SHORT_DEN,
    _SHORT_LEN,
    _ZH_DST,
    _ZH_SRC,
    OCR_LINE_W,
    ocr_artifact_rules,
    script_profile,
)

# --- pure-Python references -----------------------------------------------


def _plant(doc_id: int, lang: str, text: str) -> str:
    if lang == "zh":
        return text.translate(str.maketrans(_ZH_SRC, _ZH_DST))
    if doc_id % 13 == 0:
        return text.translate(str.maketrans(_HOMO_SRC, _HOMO_DST))
    return text


def _count(page: str, lo: int, hi: int) -> int:
    return sum(1 for c in page if lo <= ord(c) <= hi)


def _script_ref(doc_id: int, lang: str, text: str) -> dict:
    page = _plant(doc_id, lang, text)
    latin = sum(1 for c in page if c.isascii() and c.isalpha())
    cjk = _count(page, 0x4E00, 0x9FFF)
    cyr = _count(page, 0x0400, 0x04FF)
    if latin >= cjk and latin >= cyr:
        dom = "latin"
    elif cjk >= cyr:
        dom = "cjk"
    else:
        dom = "cyr"
    exp = "cjk" if lang == "zh" else "latin"
    return {
        "n_chars": len(page),
        "latin_n": latin,
        "cjk_n": cjk,
        "cyr_n": cyr,
        "dominant_script": dom,
        "expected_script": exp,
        "script_keep": dom == exp and (lang == "zh" or cyr == 0),
    }


def _lines_ref(doc_id: int, text: str) -> list[str]:
    toks = text.split(" ")
    n = max(math.ceil(len(toks) / OCR_LINE_W), 1)
    out = []
    for i in range(n):
        seg = " ".join(toks[i * OCR_LINE_W : (i + 1) * OCR_LINE_W])
        m = (37 * doc_id + i) % 6
        out.append(seg + "-" if m == 0 else ("x" if m == 1 else seg))
    return out


def _ocr_ref(doc_id: int, text: str) -> dict:
    lines = _lines_ref(doc_id, text)
    hyph = sum(1 for ln in lines if ln.endswith("-"))
    short = sum(1 for ln in lines if len(ln) < _SHORT_LEN)
    return {
        "n_lines": len(lines),
        "hyph_n": hyph,
        "short_n": short,
        "len_sum": sum(len(ln) for ln in lines),
        "ocr_keep": hyph * _HYPH_DEN <= len(lines)
        and short * _SHORT_DEN <= len(lines),
    }


def _raw_docs(spark, sf_dir):
    return {
        int(r["doc_id"]): (r["lang"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    }


# --- tests ----------------------------------------------------------------


def test_script_signals_match_python_reference(spark, sf_dir):
    raw = _raw_docs(spark, sf_dir)
    rows = script_profile(spark, sf_dir).collect()
    assert len(rows) == len(raw)
    seen_keep, seen_drop, seen_homoglyph = 0, 0, 0
    for r in rows:
        lang, text = raw[int(r["doc_id"])]
        want = _script_ref(int(r["doc_id"]), lang, text)
        got = {k: r[k] for k in want}
        assert got == want, (r["doc_id"], got, want)
        seen_keep += r["script_keep"]
        seen_drop += not r["script_keep"]
        seen_homoglyph += lang != "zh" and r["cyr_n"] > 0
    # the gate must be exercised in both directions, and the homoglyph
    # plant must actually fire — otherwise the fixture degenerated
    assert seen_keep and seen_drop and seen_homoglyph


def test_ocr_signals_match_python_reference(spark, sf_dir):
    raw = _raw_docs(spark, sf_dir)
    rows = ocr_artifact_rules(spark, sf_dir).collect()
    assert len(rows) == len(raw)
    kept = 0
    for r in rows:
        _, text = raw[int(r["doc_id"])]
        want = _ocr_ref(int(r["doc_id"]), text)
        got = {k: r[k] for k in want}
        assert got == want, (r["doc_id"], got, want)
        kept += r["ocr_keep"]
    assert 0 < kept < len(rows)


def test_plans_are_pure_projections(spark, sf_dir):
    for q in (script_profile, ocr_artifact_rules):
        plan = (
            q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, q.__name__
        assert "Python" not in plan, q.__name__


def test_oracle_parity(spark, sf_dir):
    import duckdb

    from isimip_qa_spark.queries.scriptid import _OCR_SQL, _SCRIPT_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for q, sql, key in (
        (script_profile, _SCRIPT_SQL, "doc_id"),
        (ocr_artifact_rules, _OCR_SQL, "doc_id"),
    ):
        got = (
            q(spark, sf_dir)
            .toPandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        want = con.execute(sql).df().sort_values(key).reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        for c in got.columns:
            assert got[c].tolist() == want[c].tolist(), (q.__name__, c)
