"""Sliding RANGE-frame window (`rolling_user_activity`): planted boundary /
tie answers, and the plan contract — ONE exchange on user_id, a single
Window operator, no join and no second shuffle."""

from __future__ import annotations

from datetime import datetime

import pytest

from isimip_qa_spark.queries.extras import rolling_user_activity


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# (event_id, ts, user_id, event_type, value, props)
ROWS = [
    # user 1: events at t0, t0+3600 (boundary, INCLUDED in each other's
    # trailing frame at the later row), t0+3601+3600 = first frame that no
    # longer sees t0 OR t0+3600... laid out explicitly:
    (0, _ts("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
    (1, _ts("2024-01-01 11:00:00"), 1, "view", 2.0, "{}"),  # Δ=3600 kept
    (2, _ts("2024-01-01 12:00:01"), 1, "view", 4.0, "{}"),  # Δ=3601 to id1
    # user 2: tied timestamps are RANGE-frame peers — both rows see both
    (3, _ts("2024-01-01 09:00:00"), 2, "view", 1.5, "{}"),
    (4, _ts("2024-01-01 09:00:00"), 2, "click", 2.5, "{}"),
    # user 3: negative value exercises floor() toward -inf
    (5, _ts("2024-01-01 08:00:00"), 3, "error", -1.25, "{}"),
]

SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rollwin"))
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")
    return out


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rolling_analytic(spark, planted_dir):
    got = {
        r["event_id"]: (r["roll_n"], r["roll_v64"], r["roll_avg64"])
        for r in rolling_user_activity(spark, planted_dir).collect()
    }
    # v64 = floor(value * 64): 1.0→64, 2.0→128, 4.0→256, 1.5→96, 2.5→160,
    # -1.25→-80 (floor toward -inf on an exact product)
    assert got[0] == (1, 64, 64.0)
    assert got[1] == (2, 192, 96.0)  # 3600 s back is boundary-INCLUSIVE
    assert got[2] == (1, 256, 256.0)  # 3601 s back falls out of the frame
    # tied rows are peers: each sees both
    assert got[3] == (2, 256, 128.0)
    assert got[4] == (2, 256, 128.0)
    assert got[5] == (1, -80, -80.0)


def test_rolling_plan_one_exchange_one_window_no_join(spark, planted_dir):
    plan = _plan(rolling_user_activity(spark, planted_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan
