"""host_pagerank: conservation / floor / determinism properties (exactness
vs DuckDB is the oracle row's job) and the scale-shape plan assertions."""

from __future__ import annotations

from isimip_qa_spark.queries.graph import (
    ITERS,
    QR,
    _pagerank_df,
    host_pagerank,
)


def _rows(spark, sf_dir):
    return {r["host"]: r for r in host_pagerank(spark, sf_dir).collect()}


def test_pagerank_properties(spark, sf_dir):
    got = _rows(spark, sf_dir)
    n = len(got)
    assert n >= 2
    ranks = [r["rank"] for r in got.values()]
    # mass conservation: self-loops keep outdeg >= 1, so no dangling leak —
    # total mass stays 1 up to the per-host quantization slack
    assert abs(sum(ranks) - 1.0) < n * (0.5 / QR + 1e-6) * ITERS
    # damping floor: every host holds at least the teleport share
    floor = round(round((0.15 / n) * QR) / QR, 6)
    assert all(r >= floor for r in ranks)
    assert all(g["outdeg"] >= 1 for g in got.values())
    # the graph is non-uniform by construction: ranks must actually spread
    assert max(ranks) > min(ranks)


def test_pagerank_deterministic(spark, sf_dir):
    a = _rows(spark, sf_dir)
    b = _rows(spark, sf_dir)
    assert a.keys() == b.keys()
    assert all(a[h]["rank"] == b[h]["rank"] for h in a)


def test_pagerank_plan_shape(spark, sf_dir):
    # host_pagerank itself returns a localCheckpoint (so it can unpersist
    # the edge cache — its plan is an opaque ExistingRDD scan); the shape
    # assertions inspect the lazy plan underneath it
    df, edges = _pagerank_df(spark, sf_dir)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        edges.unpersist()
    # rank/dim/degree joins all broadcast — iterations shuffle only on the
    # groupBy(dst) agg, never a sort-merge join (the one Window in the
    # lineage is the host-dim id assignment over |hosts| rows; its subtree
    # recurs in the plan TEXT once per cached-edges reference, so counting
    # occurrences is meaningless — the oracle row pins its semantics)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= ITERS + 2
    # every Window in the plan is the dim one (keyed by host ordering),
    # never a per-document window
    assert "windowspecdefinition(doc_id" not in plan.lower()


def test_pagerank_releases_edge_cache(spark, sf_dir):
    """The paired-persist contract: after host_pagerank returns, no
    corpus-derived cache entry survives in the session's CacheManager."""
    spark.catalog.clearCache()
    host_pagerank(spark, sf_dir).collect()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "host_pagerank left a cached plan behind"
