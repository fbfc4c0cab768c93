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


# ---------------------------------------------------------------------------
# queries/selection.py: keep-best-in-cluster, strided chunking, diversity.
# ---------------------------------------------------------------------------


def test_keep_best_picks_cluster_quality_argmax(spark):
    from isimip_qa_spark.queries.dedup import dedup_clusters
    from isimip_qa_spark.queries.selection import dedup_keep_best
    from isimip_qa_spark.queries.webtext import quality_score

    best = {r["cluster_id"]: r for r in dedup_keep_best(spark, SF).collect()}
    members = {}
    for r in dedup_clusters(spark, SF).collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    quality = {
        r["doc_id"]: r["quality"] for r in quality_score(spark, SF).collect()
    }
    # one winner per cluster, and it is the (quality DESC, doc_id ASC) argmax
    assert set(best) == set(members)
    for cid, docs in members.items():
        want = min(docs, key=lambda d: (-quality[d], d))
        assert best[cid]["doc_id"] == want
        assert best[cid]["quality"] == quality[want]


def test_keep_best_is_aggregation_not_window(spark):
    """The argmax must be a partial-aggregable hash agg (no per-cluster
    window funnel) — the 100-TB boilerplate-cluster guard."""
    from isimip_qa_spark.queries.selection import dedup_keep_best

    plan = dedup_keep_best(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # partial/final split across the exchange — the property that makes the
    # argmax map-side-combining. (struct buffers are not hash-mutable, so
    # the operator is SortAggregate; the old "HashAggregate in plan" check
    # was satisfied by the upstream cluster lineage, now truncated by
    # cluster_assignment's checkpoint.)
    assert "partial_max(struct" in plan
    assert plan.count("max(struct") >= 2  # partial + final


def test_chunking_reconstructs_every_document(spark):
    from isimip_qa_spark.queries.selection import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_long_docs,
    )
    from isimip_qa_spark.catalog import read_table

    texts = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, SF, "documents").collect()
    }
    chunks = {}
    for r in chunk_long_docs(spark, SF).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    assert set(chunks) == set(texts)
    for doc_id, rows in chunks.items():
        toks = texts[doc_id].split(" ")
        rows.sort(key=lambda r: r["chunk_idx"])
        for r in rows:
            want = toks[r["start_tok"] : r["start_tok"] + CHUNK_TOKENS]
            assert r["chunk_text"].split(" ") == want
            assert r["n_tok"] == len(want)
        # strided starts tile the doc: chunk i starts at i*STRIDE, last < n
        starts = [r["start_tok"] for r in rows]
        assert starts == list(range(0, len(toks), CHUNK_STRIDE))


def test_chunking_has_no_shuffle(spark):
    from isimip_qa_spark.queries.selection import chunk_long_docs

    df = chunk_long_docs(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the operator (split → explode → slice) is a narrow map: ZERO
    # exchanges (the former terminal orderBy is gone — per-doc outputs
    # must not globally sort the corpus)
    assert "Exchange" not in plan


def test_domain_diversity_analytic_bounds(spark):
    import math

    from isimip_qa_spark.catalog import read_table
    from isimip_qa_spark.queries.selection import domain_diversity

    row = domain_diversity(spark, SF).collect()[0]
    docs = read_table(spark, SF, "documents").collect()
    per = {}
    for r in docs:
        per[r["source"]] = per.get(r["source"], 0) + len(r["text"].split(" "))
    tot = sum(per.values())
    shares = [v / tot for v in per.values()]
    ent = -sum(p * math.log2(p) for p in shares)
    assert row["n_sources"] == len(per)
    assert row["total_tokens"] == tot
    # entropy/HHI terms are QD-quantized before the sum (dyadic-sum-exact
    # cross-engine discipline, see the query docstring) — the analytic
    # unquantized recomputation can differ by up to n_sources/2^21
    qtol = len(per) / (1 << 21) + 1e-9
    assert abs(row["entropy_bits"] - round(ent, 6)) < qtol
    assert abs(row["hhi"] - round(sum(p * p for p in shares), 6)) < qtol
    assert abs(row["top_share"] - round(max(shares), 6)) < 1e-9
    # normalized entropy in (0, 1]; equals 1 only for a uniform corpus
    assert 0.0 < row["norm_entropy"] <= 1.0
