"""Rendezvous (HRW) sharding: the minimal-disruption property that is the
entire point of the operator, plus the zero-shuffle plan shape.

Property under test (S -> S+1):
  * every doc that changes shard moves TO the new shard — old shards never
    trade docs with each other (exact, by construction of argmax: adding a
    candidate can only win, never reorder the existing ones);
  * the moved fraction is ~1/(S+1) (binomial bounds, deterministic corpus).
"""

from __future__ import annotations

from isimip_qa_spark.catalog import read_table
from isimip_qa_spark.queries.layout import RV_SHARDS, rendezvous_assign

SF_DIR = "/root/testdata/sf0.01"  # 500 docs: enough mass for the bounds


def _assign(spark, n_shards):
    d = read_table(spark, SF_DIR, "documents")
    rows = rendezvous_assign(d, n_shards).collect()
    return {r.doc_id: r.shard_id for r in rows}


def test_grow_by_one_moves_only_to_new_shard(spark):
    before = _assign(spark, RV_SHARDS)
    after = _assign(spark, RV_SHARDS + 1)
    assert before.keys() == after.keys()
    moved = {k for k in before if before[k] != after[k]}
    # exactness: movement is only ever into the new shard
    assert all(after[k] == RV_SHARDS for k in moved)
    # everyone who didn't move kept their exact old shard
    assert all(after[k] == before[k] for k in before.keys() - moved)
    # expected |moved| ~ Binomial(500, 1/17): mean 29.4, sd 5.3 — 5-sigma
    n = len(before)
    assert n == 500
    assert 3 <= len(moved) <= 57, len(moved)


def test_mod_n_comparison_disrupts_massively(spark):
    """The contrast claim in the docstring: mod-N placement (shard_shuffle's
    scheme) remaps most of the corpus on resize, HRW does not."""
    from pyspark.sql import functions as F

    from isimip_qa_spark.functions import textstats as ts
    from isimip_qa_spark.functions.fingerprint import rolling_fingerprint_expr

    d = read_table(spark, SF_DIR, "documents")
    fp = rolling_fingerprint_expr(ts.tokens_expr(F.col("text")))
    mod = {
        s: {
            r.doc_id: r.shard_id
            for r in d.select(
                "doc_id", F.pmod(fp, F.lit(s)).alias("shard_id")
            ).collect()
        }
        for s in (RV_SHARDS, RV_SHARDS + 1)
    }
    mod_moved = sum(
        1
        for k in mod[RV_SHARDS]
        if mod[RV_SHARDS][k] != mod[RV_SHARDS + 1][k]
    )
    # mod-N: ~ (1 - 1/17) = 94% moves; HRW: ~6%. Assert the separation.
    assert mod_moved > 400, mod_moved


def test_zero_shuffle_plan(spark):
    d = read_table(spark, SF_DIR, "documents")
    plan = (
        rendezvous_assign(d, RV_SHARDS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_shard_balance(spark):
    assign = _assign(spark, RV_SHARDS)
    counts = {}
    for s in assign.values():
        counts[s] = counts.get(s, 0) + 1
    assert len(counts) == RV_SHARDS  # every shard populated at n=500
    # uniform hash: expect ~31 +- Poisson; catch gross imbalance only
    assert max(counts.values()) <= 4 * min(counts.values()), counts


def test_large_shard_count_not_capped(spark):
    """S > 64 must actually use S shards (a fixed coefficient table once
    silently capped assignment at 64 shards — regression guard)."""
    assign = _assign(spark, 100)
    used = set(assign.values())
    assert max(used) >= 64, sorted(used)[-5:]  # shards beyond the old cap
    # prefix stability: growing 16 -> 100 still only moves docs INTO new shards
    before = _assign(spark, RV_SHARDS)
    moved = {k for k in before if before[k] != assign[k]}
    assert all(assign[k] >= RV_SHARDS for k in moved)
