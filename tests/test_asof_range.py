"""As-of join (union + carry-forward) and bucketized range join: planted
analytic answers incl. tie/boundary cases, and the plan contracts — asof is
ONE exchange with no join operator at all; range join is an equi hash join,
never a BroadcastNestedLoopJoin/CartesianProduct."""

from __future__ import annotations

from datetime import datetime

import pytest

from isimip_qa_spark.queries.extras import asof_join_events, range_join_errors


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# (event_id, ts, user_id, event_type, value, props)
ROWS = [
    # user 1: view@10:00 (id 0), views@10:05 (ids 1,2 — tie, max wins),
    # purchase@10:05 (id 3 — equal ts: matches the tied views),
    # purchase@10:30 (id 4 — matches id 2's 10:05 view)
    (0, _ts("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
    (1, _ts("2024-01-01 10:05:00"), 1, "view", 2.0, "{}"),
    (2, _ts("2024-01-01 10:05:00"), 1, "view", 3.0, "{}"),
    (3, _ts("2024-01-01 10:05:00"), 1, "purchase", 9.0, "{}"),
    (4, _ts("2024-01-01 10:30:00"), 1, "purchase", 9.0, "{}"),
    # user 2: purchase BEFORE any view -> NULL match; later purchase matches
    (5, _ts("2024-01-01 09:00:00"), 2, "purchase", 9.0, "{}"),
    (6, _ts("2024-01-01 09:30:00"), 2, "view", 4.0, "{}"),
    (7, _ts("2024-01-01 09:45:00"), 2, "purchase", 9.0, "{}"),
    # user 3: errors at +300s (boundary, kept) and +301s (dropped) around
    # a purchase; error from ANOTHER user at the same ts never joins
    (8, _ts("2024-01-02 12:00:00"), 3, "purchase", 9.0, "{}"),
    (9, _ts("2024-01-02 12:05:00"), 3, "error", 0.0, "{}"),
    (10, _ts("2024-01-02 12:05:01"), 3, "error", 0.0, "{}"),
    (11, _ts("2024-01-02 11:55:00"), 3, "error", 0.0, "{}"),
    (12, _ts("2024-01-02 12:00:30"), 4, "error", 0.0, "{}"),
]

SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("asofrange"))
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")
    return out


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_analytic(spark, planted_dir):
    got = {
        r["event_id"]: (r["view_event"], r["view_value"])
        for r in asof_join_events(spark, planted_dir).collect()
    }
    assert got[3] == (2, 3.0)  # equal-ts views visible; max event_id wins
    assert got[4] == (2, 3.0)  # carried forward past the tie
    assert got[5] == (None, None)  # purchase before any view
    assert got[7] == (6, 4.0)
    assert got[8] == (None, None)  # user 3 has no views at all


def test_asof_plan_one_exchange_no_join(spark, planted_dir):
    plan = _plan(asof_join_events(spark, planted_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_range_analytic(spark, planted_dir):
    rows = range_join_errors(spark, planted_dir).collect()
    got = {(r["purchase_event"], r["error_event"]): r["gap_s"] for r in rows}
    # purchase 8 (12:00): errors at -300s (11:55) and +300s (12:05) are
    # boundary-kept; +301s (12:05:01) dropped; user-4 error never joins
    assert got == {(8, 9): -300, (8, 11): 300}


def test_range_no_duplicate_pairs(spark, planted_dir):
    rows = range_join_errors(spark, planted_dir).collect()
    pairs = [(r["purchase_event"], r["error_event"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_range_plan_is_equi_join(spark, planted_dir):
    plan = _plan(range_join_errors(spark, planted_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
