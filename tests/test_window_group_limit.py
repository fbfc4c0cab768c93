"""Pin Spark 4's partial WindowGroupLimit pushdown for the rank windows.

`host_quota_sample` (queries/mixing.py) and `topk_per_group`
(queries/extras.py) are scale-safe ONLY because Spark pushes the
`row_number() <= K` limit BELOW the exchange: each map task keeps at most
K rows per group locally, so a Zipfian hot group ships K·partitions rows
instead of its full mass into one reducer. Round-3 verified this in the
live physical plan by hand; this test locks it so a version bump or query
refactor that silently drops the pushdown (reverting the window to a
full-group funnel) fails CI instead of melting a 10^12-row run.
"""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def _executed_plan(df):
    df.collect()  # materialise so AQE finalises the physical plan
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_partial_limit_before_exchange(plan):
    # expect: ... Exchange ... WindowGroupLimit ... Partial ... Scan (plan
    # prints top-down, so the Partial limit BELOW the exchange appears
    # AFTER it in the string, between the exchange and the scan)
    matches = [
        (m.start(), m.group(0))
        for m in re.finditer(r"WindowGroupLimit.*?(Partial|Final)", plan)
    ]
    partials = [pos for pos, text in matches if text.endswith("Partial")]
    assert partials, f"no partial WindowGroupLimit in plan:\n{plan}"
    exchanges = [m.start() for m in re.finditer(r"Exchange hashpartitioning", plan)]
    assert exchanges, f"no hash exchange in plan:\n{plan}"
    # at least one Partial limit sits below (prints after) an exchange
    assert any(p > min(exchanges) for p in partials), (
        f"partial WindowGroupLimit not below the exchange:\n{plan}"
    )


def test_host_quota_sample_partial_window_group_limit(spark):
    from isimip_qa_spark.queries.mixing import host_quota_sample

    plan = _executed_plan(host_quota_sample(spark, SF))
    _assert_partial_limit_before_exchange(plan)


def test_topk_per_group_partial_window_group_limit(spark):
    from isimip_qa_spark.queries.extras import topk_per_group

    plan = _executed_plan(topk_per_group(spark, SF))
    _assert_partial_limit_before_exchange(plan)


def test_cluster_balanced_sample_partial_window_group_limit(spark):
    # the per-cell top-k in cluster_balanced_sample rides the same pattern
    from isimip_qa_spark.queries.ann import cluster_balanced_sample

    plan = _executed_plan(cluster_balanced_sample(spark, SF))
    _assert_partial_limit_before_exchange(plan)
