"""C4 line-level cleaning: predicate semantics on planted multi-line pages
vs an independent pure-Python reference, the zero-shuffle plan contract,
and sf0.001 parity with the registered DuckDB twin."""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from isimip_qa_spark.functions.textstats import (
    C4_MIN_LINE_WORDS,
    C4_NEWLINE_RE,
    C4_WORD_RE,
    c4_clean_lines_expr,
    c4_line_keep_expr,
    c4_line_keep_sql,
)
from isimip_qa_spark.queries.curation import c4_line_clean

PLANTED = [
    "Good first sentence here.\nno terminal punct\nAnother fine line!",
    'She said "stop".\nEnds with a quote."\ntwo words.\nw x y z?',
    "Enable JavaScript to view this page.\nReal content stays here.",
    "",  # one empty line -> dropped (no terminal, 0 words)
    "ok.\nok ok.\nok ok ok.",  # word-count boundary: only the 3-word line
    "Tail space after period. \nclean line three words.",  # trailing space
    "a.b.c? d! e.\nmany tiny words end well.",
    "line\n\nline two ok.\n",  # empty interior + trailing newline
    # CRLF page: Java `$` matches before a trailing '\r' but RE2 does not —
    # universal-newline splitting must strip the '\r' before the anchor
    "Windows crawled line one.\r\nWindows crawled line two.\r\nno punct\r\n",
    "old mac line breaks here.\rsecond old mac line here.",
    # \x0B is whitespace to Java's \S but not RE2's: the explicit word
    # class must agree (the middle token splits -> 4 words, kept)
    "a b\x0bc d.\ntiny\x0bx.",
]


def _py_keep(ln: str) -> bool:
    return (
        bool(re.search(r'[.!?"]$', ln))
        and len(re.findall(C4_WORD_RE, ln)) >= C4_MIN_LINE_WORDS
        and "javascript" not in ln.lower()
    )


def _py_clean(text: str) -> str:
    return "\n".join(
        ln for ln in re.split(C4_NEWLINE_RE, text) if _py_keep(ln)
    )


@pytest.fixture(scope="module")
def planted(spark):
    rows = [(i, t) for i, t in enumerate(PLANTED)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_matches_python_reference(planted):
    got = (
        planted.select(
            "doc_id", c4_clean_lines_expr(F.col("text")).alias("cleaned")
        )
        .toPandas()
        .sort_values("doc_id")
    )
    for _, r in got.iterrows():
        assert r["cleaned"] == _py_clean(PLANTED[int(r["doc_id"])])


def test_keep_flags_match_duckdb_twin(planted):
    flags = (
        planted.select(
            "doc_id",
            F.transform(
                F.split(F.col("text"), C4_NEWLINE_RE), c4_line_keep_expr
            ).alias("keeps"),
        )
        .toPandas()
        .sort_values("doc_id")
    )
    con = duckdb.connect()
    for _, r in flags.iterrows():
        text = PLANTED[int(r["doc_id"])]
        want = [
            con.execute(
                f"SELECT {c4_line_keep_sql('ln')} FROM (SELECT ? AS ln)",
                [ln],
            ).fetchone()[0]
            for ln in re.split(C4_NEWLINE_RE, text)
        ]
        assert list(r["keeps"]) == want


def test_plan_is_pure_projection(spark, sf_dir):
    plan = (
        c4_line_clean(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_sf_parity_with_oracle(spark, sf_dir):
    from isimip_qa_spark.queries.curation import _C4_LINE_SQL

    got = (
        c4_line_clean(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(_C4_LINE_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype({"n_lines": "int64", "n_kept": "int64"}),
        want[sorted(want.columns)].astype(
            {"n_lines": "int64", "n_kept": "int64"}
        ),
        check_dtype=False,
    )
    # every planted branch occurs: some pages gated out, some kept
    assert got["page_keep"].any() and (~got["page_keep"]).any()
    # the javascript line never survives
    assert not got["cleaned"].str.lower().str.contains("javascript").any()
