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
    key = (spark.sparkContext.applicationId, str(sf_dir))
    assert _ASSIGNMENT_MEMO[key] is a
    # the checkpoint truncates the minhash-pair + CC lineage: consuming the
    # assignment runs NO exchange of its own
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


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
