"""cut_dup_spans — the apply face of the substring-span table.

Planted fixture: two documents share one verbatim 7-token passage (>=
K_GRAM, so its k-grams duplicate), embedded at different positions inside
otherwise-unique text; a third document is entirely unique; a fourth IS
the passage and nothing else (fully cut). Asserts:

  - the rebuilt text equals a pure-Python reference cutter run over the
    span table (exact byte compare, including the fully-cut -> '' doc);
  - span-free documents pass through byte-identical;
  - n_cut agrees with doc_dup_coverage's dup_tokens on the same corpus
    (the report and the apply can never disagree);
  - the keep test stays a pure column expression (no Python in the plan).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


PASSAGE = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens >= K_GRAM


def _mk_docs():
    uniq1 = "one two three four five six seven eight nine ten"
    uniq2 = "red green blue yellow purple orange pink brown grey black"
    uniq3 = "ant bee cat dog elk fox gnu hen ibex jay kiwi lynx"
    return [
        (0, uniq1.split()[:5], PASSAGE, uniq1.split()[5:]),  # passage mid
        (1, [], PASSAGE, uniq2.split()),                     # passage head
        (2, uniq3.split(), "", []),                          # no passage
        (3, [], PASSAGE, []),                                # passage only
    ]


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    rows = []
    for did, pre, mid, post in _mk_docs():
        toks = pre + (mid.split() if mid else []) + post
        rows.append((did, " ".join(toks)))
    d = str(tmp_path_factory.mktemp("cutdocs"))
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, f"{d}/documents.parquet")
    return d


def _python_cut(texts: dict[int, str], spans: dict[int, list]) -> dict[int, str]:
    out = {}
    for did, text in texts.items():
        toks = text.split(" ")
        covered = set()
        for s, e in spans.get(did, []):
            covered.update(range(s, e + 1))
        out[did] = " ".join(
            t for i, t in enumerate(toks) if i not in covered
        )
    return out


def test_cut_matches_python_reference_and_coverage(spark, docs_dir):
    from isimip_qa_spark.queries.substring import (
        cut_dup_spans,
        dedup_substring_spans,
        doc_dup_coverage,
    )

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{docs_dir}/documents.parquet").collect()
    }
    spans: dict[int, list] = {}
    for r in dedup_substring_spans(spark, docs_dir).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    # the planted passage must actually produce spans in docs 0, 1, 3
    assert set(spans) == {0, 1, 3}

    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_cut"])
        for r in cut_dup_spans(spark, docs_dir).collect()
    }
    want = _python_cut(texts, spans)
    assert {d: g[0] for d, g in got.items()} == want
    # span-free doc passes through byte-identical; passage-only doc -> ''
    assert got[2][0] == texts[2] and got[2][2] == 0
    assert got[3][0] == "" and got[3][2] == got[3][1]
    # apply face agrees with the report face
    cov = {
        r["doc_id"]: r["dup_tokens"]
        for r in doc_dup_coverage(spark, docs_dir).collect()
    }
    for did, (_, _, n_cut) in got.items():
        assert n_cut == cov[did], did


def test_cut_twins_agree_on_random_corpora(spark, tmp_path):
    """Property: Spark and the DuckDB twin agree byte-for-byte on random
    corpora drawn from a tiny word alphabet (high k-gram collision rate →
    natural duplicated spans), including the edges the fixture can't hit:
    empty text, single-token docs, docs of exactly K_GRAM tokens, docs
    that are one long duplicated run."""
    import duckdb

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from isimip_qa_spark.queries.substring import K_GRAM, _cut_sql, cut_dup_spans

    words = ["aa", "bb", "cc"]
    doc = st.lists(st.sampled_from(words), max_size=12).map(" ".join)
    corpora = st.lists(doc, min_size=2, max_size=8)
    counter = [0]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpora)
    def run(texts):
        counter[0] += 1
        d = tmp_path / f"rc{counter[0]}"
        d.mkdir()
        table = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(table, f"{d}/documents.parquet")
        got = sorted(
            (r["doc_id"], r["clean_text"], r["n_tokens"], r["n_cut"])
            for r in cut_dup_spans(spark, str(d)).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(tuple(r) for r in con.execute(_cut_sql(K_GRAM)).fetchall())
        assert got == want

    run()


def test_cut_plan_is_python_free(spark, docs_dir):
    from isimip_qa_spark.queries.substring import cut_dup_spans

    plan = (
        cut_dup_spans(spark, docs_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # keep test is pure column expressions
