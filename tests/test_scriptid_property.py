"""Property-based cross-engine parity for the scriptid / meta-extraction
twin pieces (translate plants, script-class counting, case-insensitive
head-tag regexes) over adversarial unicode — the companion of
tests/test_twin_property.py for the operators added in this session.
The fixture-corpus tests pin the full queries; these pin the primitive
twins on text the corpus never contains (mixed scripts, quotes inside
attributes, newlines, control chars)."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isimip_qa_spark.queries.extract import _CANON_RE, _ROBOTS_RE
from isimip_qa_spark.queries.scriptid import (
    _CJK_CLASS,
    _CYR_CLASS,
    _HOMO_DST,
    _HOMO_SRC,
    _LATIN_CLASS,
    _ZH_DST,
    _ZH_SRC,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# mixed-script text: the BMP range the sibling property file draws, plus
# explicit CJK / Cyrillic / Greek samples (outside its 0x2FFF ceiling) and
# the separator/quote chars the regexes care about
_text = st.text(
    alphabet=st.one_of(
        st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
        ),
        st.sampled_from(list("的一是不了人在有我他")),
        st.sampled_from(list("аеоАБВгд")),
        st.sampled_from([" ", "\n", '"', "'", "<", ">", "="]),
    ),
    max_size=60,
)


def _duck(values, expr_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    for i, t in enumerate(values):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
    return dict(
        con.execute(f"SELECT i, {expr_sql} FROM t ORDER BY i").fetchall()
    )


def _spark_vals(spark, values, col):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(values)], "i long, text string"
    )
    return {r["i"]: r["v"] for r in df.select("i", col.alias("v")).collect()}


@given(texts=st.lists(_text, min_size=1, max_size=10))
@_SETTINGS
def test_translate_plant_parity(spark, texts):
    for src, dst in ((_ZH_SRC, _ZH_DST), (_HOMO_SRC, _HOMO_DST)):
        s = _spark_vals(spark, texts, F.translate(F.col("text"), src, dst))
        d = _duck(texts, f"translate(text, '{src}', '{dst}')")
        assert s == d, (src, dst)


@given(texts=st.lists(_text, min_size=1, max_size=10))
@_SETTINGS
def test_script_class_count_parity(spark, texts):
    for cls in (_LATIN_CLASS, _CJK_CLASS, _CYR_CLASS):
        s = _spark_vals(
            spark,
            texts,
            F.regexp_count(F.col("text"), F.lit(cls)).cast("long"),
        )
        d = _duck(texts, f"len(regexp_extract_all(text, '{cls}'))::BIGINT")
        assert s == d, cls


# heads: drawn junk around (possibly mangled) tag fragments, so the
# group-1 extraction must agree on hits AND on misses
_head = st.builds(
    lambda pre, name, content, post: (
        f'{pre}<meta name="{name}" content="{content}">'
        f'<link rel="canonical" href="{content}">{post}'
    ),
    _text,
    st.sampled_from(["robots", "ROBOTS", "Robots", "viewport", "r obots"]),
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_categories=("Cs",),
            exclude_characters='"',
            max_codepoint=0x2FFF,
        ),
        max_size=20,
    ),
    _text,
)


@given(heads=st.lists(st.one_of(_head, _text), min_size=1, max_size=10))
@_SETTINGS
def test_head_tag_regex_parity(spark, heads):
    for pat in (_ROBOTS_RE, _CANON_RE):
        s = _spark_vals(
            spark, heads, F.regexp_extract(F.col("text"), pat, 1)
        )
        d = _duck(heads, f"coalesce(regexp_extract(text, '{pat}', 1), '')")
        assert s == d, pat
