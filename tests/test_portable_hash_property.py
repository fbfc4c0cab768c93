"""Property-based cross-engine parity for the portable hash contract.

The dedup/sampling/DSIR family's correctness against the DuckDB oracles
rests on three expression twins producing identical values on BOTH engines
for ARBITRARY web text — not just the driver fixtures. Hypothesis hammers
them with adversarial inputs (empty strings, runs of spaces, unicode,
control chars); any divergence here would silently make sample membership
/ shard placement / DSIR scores engine-dependent in production.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isimip_qa_spark.functions.fingerprint import (
    rolling_fingerprint_expr,
    rolling_fingerprint_sql,
    shingles_expr,
    shingles_sql,
)
from isimip_qa_spark.functions.textstats import tokens_expr
from isimip_qa_spark.queries.dsir import _ngram_buckets_expr, _ngram_buckets_sql

# printable-ish web text: letters (incl. unicode), digits, spaces, a few
# control/format chars — no surrogates (not valid UTF-8 on either engine)
_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFFF
    ),
    max_size=80,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _duck(texts, expr_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
    return dict(con.execute(f"SELECT i, {expr_sql} FROM t ORDER BY i").fetchall())


def _spark_vals(spark, texts, col):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    return {r["i"]: r["v"] for r in df.select("i", col.alias("v")).collect()}


@given(texts=st.lists(_text, min_size=1, max_size=12))
@_SETTINGS
def test_rolling_fingerprint_parity(spark, texts):
    s = _spark_vals(
        spark, texts, rolling_fingerprint_expr(tokens_expr(F.col("text")))
    )
    d = _duck(texts, rolling_fingerprint_sql("string_split(text, chr(32))"))
    assert s == d


@given(texts=st.lists(_text, min_size=1, max_size=8))
@_SETTINGS
def test_shingles_parity(spark, texts):
    s = _spark_vals(spark, texts, shingles_expr(tokens_expr(F.col("text"))))
    d = _duck(texts, shingles_sql("string_split(text, chr(32))"))
    assert {k: list(v) for k, v in s.items()} == d


@given(texts=st.lists(_text, min_size=1, max_size=8))
@_SETTINGS
def test_dsir_ngram_buckets_parity(spark, texts):
    s = _spark_vals(
        spark, texts, _ngram_buckets_expr(tokens_expr(F.col("text")))
    )
    d = _duck(texts, _ngram_buckets_sql("string_split(text, chr(32))"))
    assert {k: list(v) for k, v in s.items()} == d


@pytest.mark.parametrize(
    "t",
    ["", " ", "  ", "a  b", "日本語 テスト", "\xa0nbsp", "a b", "\x00nul"],
)
def test_known_edge_cases(spark, t):
    s = _spark_vals(
        spark, [t], rolling_fingerprint_expr(tokens_expr(F.col("text")))
    )
    d = _duck([t], rolling_fingerprint_sql("string_split(text, chr(32))"))
    assert s == d
