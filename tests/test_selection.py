"""Training-set assembly operators (shard_shuffle, stratified_split,
host_quota_sample): determinism, distribution sanity, and plan shapes."""

from __future__ import annotations

from collections import Counter

from isimip_qa_spark.queries.mixing import (
    HOST_QUOTA,
    N_SHARDS,
    host_quota_sample,
    shard_shuffle,
    stratified_split,
)

SF = "/root/testdata/sf0.01"


def test_shard_shuffle_is_a_permutation_and_deterministic(spark):
    rows = shard_shuffle(spark, SF).collect()
    assert len(rows) == 500  # every doc placed exactly once
    assert len({r["doc_id"] for r in rows}) == 500
    # positions within each shard are contiguous from 1
    per_shard = Counter(r["shard_id"] for r in rows)
    assert set(per_shard) <= set(range(N_SHARDS))
    pos = {}
    for r in rows:
        pos.setdefault(r["shard_id"], []).append(r["pos"])
    for s, ps in pos.items():
        assert sorted(ps) == list(range(1, per_shard[s] + 1))
    # rerun → identical placement (content-keyed, no rand())
    again = shard_shuffle(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # shards are roughly uniform (fingerprint uniformity): no shard > 3x mean
    assert max(per_shard.values()) <= 3 * (500 // N_SHARDS)


def test_shard_shuffle_plan_partitions_by_shard(spark):
    plan = (
        shard_shuffle(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard_id" in plan


def test_stratified_split_fractions_and_no_shuffle(spark):
    df = stratified_split(spark, SF)
    rows = df.collect()
    frac = Counter(r["split"] for r in rows)
    assert frac["train"] > frac["valid"] and frac["train"] > frac["test"]
    # ~96/2/2 with 500 docs: train within [85%, 100%)
    assert 0.85 <= frac["train"] / 500 <= 0.995
    # per-language stratification: every lang has train rows
    langs = {}
    for r in rows:
        langs.setdefault(r["lang"], Counter())[r["split"]] += 1
    for lang, c in langs.items():
        assert c["train"] > 0, lang
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_host_quota_caps_every_source(spark):
    rows = host_quota_sample(spark, SF).collect()
    per_src = Counter(r["source"] for r in rows)
    assert max(per_src.values()) <= HOST_QUOTA
    assert all(1 <= r["rk"] <= HOST_QUOTA for r in rows)
    # 20 sources x 25 docs each at sf0.01 → every source saturates its quota
    assert len(per_src) == 20
    assert set(per_src.values()) == {HOST_QUOTA}


def test_drop_attribution_funnel_consistency(spark):
    from isimip_qa_spark.queries.webtext import drop_attribution

    rows = {r["rule"]: r for r in drop_attribution(spark, SF).collect()}
    kept = rows.pop("(kept)")
    # waterfall covers every doc exactly once
    assert sum(r["n_attributed"] for r in rows.values()) + kept["n_attributed"] == 500
    # attribution never exceeds the marginal violation count
    for r in rows.values():
        assert 0 <= r["n_attributed"] <= r["n_viol"]
    # keep-rate agrees with the keep_expr-based gopher_rules query
    from isimip_qa_spark.queries.webtext import gopher_rules

    n_keep = gopher_rules(spark, SF).filter("keep").count()
    assert kept["n_attributed"] == n_keep
