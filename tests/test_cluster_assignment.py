"""Materialise-once cluster assignment (queries/dedup.py:cluster_assignment):
value parity with the pure dedup_clusters chain, memoisation, lineage
truncation, and the one-exchange shape it buys every consumer."""

from __future__ import annotations

import pandas as pd

from isimip_qa_spark.queries.dedup import (
    _ASSIGNMENT_MEMO,
    cluster_assignment,
    dedup_clusters,
)
from isimip_qa_spark.queries.selection import repeat_weights


def _sorted(df) -> pd.DataFrame:
    return (
        df.toPandas().sort_values("doc_id").reset_index(drop=True)
    )


def test_parity_with_pure_chain(spark, sf_dir):
    got = _sorted(cluster_assignment(spark, sf_dir))
    want = _sorted(dedup_clusters(spark, sf_dir))
    pd.testing.assert_frame_equal(got, want)


def test_memoised_and_lineage_truncated(spark, sf_dir):
    a = cluster_assignment(spark, sf_dir)
    b = cluster_assignment(spark, sf_dir)
    # same materialised frame, not a recomputation
    assert a is b
    assert any(v is a for v in _ASSIGNMENT_MEMO.values())
    # the checkpoint truncates the minhash-pair + CC lineage: consuming the
    # assignment runs NO exchange of its own
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _write_docs(dirpath, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["h0.example.org"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(f"{dirpath}/documents.parquet")


def test_rewriting_the_table_invalidates_the_memo(spark, tmp_path):
    d = str(tmp_path)
    base = [f"unique document number {i} with its own words" for i in range(6)]
    _write_docs(d, base)
    a = cluster_assignment(spark, d)
    n_a = a.count()
    # overwrite with a DIFFERENT corpus at the same path: the stat token in
    # the memo key must miss, not serve the stale assignment
    _write_docs(d, base + ["one more page entirely absent before now"])
    b = cluster_assignment(spark, d)
    assert b is not a
    assert b.count() == n_a + 1


def test_consumer_pays_one_exchange(spark, sf_dir):
    # repeat_weights over the materialised assignment: scan of the
    # checkpointed rows -> ONE hashpartitioning(cluster_id) -> Window
    cluster_assignment(spark, sf_dir)  # ensure materialised
    plan = (
        repeat_weights(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(cluster_id" in plan
    assert plan.count("Window") == 1
