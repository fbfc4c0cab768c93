"""Property-based semantic pin for lang_consistency: the Spark expression
path must equal a direct pure-Python reference on random mixes of
stop-words (all five languages, mixed case), junk tokens, and empty
tokens (consecutive-space artifacts) — catching shared-twin bugs the
DuckDB oracle (which mirrors the same expression tree) cannot."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from isimip_qa_spark.functions.langid import LANG_ORDER, LANG_STOPWORDS
from isimip_qa_spark.queries.webtext import (
    LANG_WIN,
    MIX_AGREE_MIN,
    lang_consistency,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_POOL = (
    [w for sw in LANG_STOPWORDS.values() for w in sw]
    + ["THE", "Der", "QUE", "xx", "zzz", "q1", ""]
)

_doc = st.lists(st.sampled_from(_POOL), min_size=0, max_size=35).map(
    " ".join
)

_SW_SETS = {lang: set(sw) for lang, sw in LANG_STOPWORDS.items()}


def _pred(tokens: list[str]) -> str:
    scores = {
        lang: sum(t in _SW_SETS[lang] for t in tokens) for lang in LANG_ORDER
    }
    best = LANG_ORDER[0]
    for lang in LANG_ORDER[1:]:
        if scores[lang] > scores[best]:
            best = lang  # strict > keeps the FIRST maximal language
    return best


def _ref(text: str):
    toks = text.lower().split(" ")
    n_win = (len(toks) + LANG_WIN - 1) // LANG_WIN
    wins = [toks[i * LANG_WIN : (i + 1) * LANG_WIN] for i in range(n_win)]
    doc = _pred(toks)
    agree = sum(_pred(w) == doc for w in wins)
    frac = round(agree / n_win, 6)
    return (doc, n_win, agree, frac, frac < MIX_AGREE_MIN)


@given(texts=st.lists(_doc, min_size=1, max_size=8))
@_SETTINGS
def test_lang_consistency_matches_python_reference(spark, texts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("langprop"))
    spark.createDataFrame(
        [(i, t, "en", "s", 1) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = {
        r["doc_id"]: (
            r["doc_lang"],
            r["n_windows"],
            r["n_agree"],
            r["agree_frac"],
            r["mixed_lang_doc"],
        )
        for r in lang_consistency(spark, out).collect()
    }
    want = {i: _ref(t) for i, t in enumerate(texts)}
    assert got == want
