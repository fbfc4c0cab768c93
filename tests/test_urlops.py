"""URL canonicalization / latest-capture dedup / blocklist + text
normalization + lang rebalance: rule-level unit cases and plan-shape
assertions (the oracle gate covers value parity; these pin semantics and
the broadcast/no-shuffle contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from isimip_qa_spark.functions.normalize import normalize_text_expr
from isimip_qa_spark.functions.urlops import canonical_url_expr, url_host_expr
from isimip_qa_spark.queries import QUERIES, load_all

load_all()


CANON_CASES = [
    # fragment stripped
    ("http://a.com/x#frag", "http://a.com/x"),
    # scheme+host lowercased, path case preserved
    ("HTTP://WWW.Ex.COM/Path/X", "http://www.ex.com/Path/X"),
    # default ports dropped, non-default kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),
    # tracking params dropped, survivors sorted, empties dropped
    ("http://a.com/x?utm_source=f&b=2&a=1", "http://a.com/x?a=1&b=2"),
    ("http://a.com/x?gclid=1&fbclid=2&ref=h", "http://a.com/x"),
    ("http://a.com/x?b=2&&a=1&", "http://a.com/x?a=1&b=2"),
    # query emptied entirely -> no '?'
    ("http://a.com/x?utm_campaign=z#f", "http://a.com/x"),
    # empty path -> '/'
    ("http://A.com", "http://a.com/"),
    ("http://a.com?id=1", "http://a.com/?id=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in CANON_CASES], ["url"]
    ).select(canonical_url_expr(F.col("url")).alias("c"))
    got = [r.c for r in df.collect()]
    want = [w for _, w in CANON_CASES]
    assert got == want


def test_url_host_cases(spark):
    rows = [
        ("http://User.Ex.COM:8080/p?q=1#f", "user.ex.com"),
        ("https://a.com/", "a.com"),
        ("http://a.com", "a.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["url"]).select(
        url_host_expr(F.col("url")).alias("h")
    )
    assert [r.h for r in df.collect()] == [w for _, w in rows]


def test_host_blocklist_is_broadcast_and_blocks(spark, sf_dir):
    df = QUERIES["host_blocklist"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    hosts = {r.host for r in df.collect()}
    from isimip_qa_spark.queries.urlops import BLOCKED_HOSTS

    assert hosts and not (hosts & set(BLOCKED_HOSTS))


def test_dedup_url_latest_group_winner(spark, sf_dir):
    """Winner per canonical group is the max-capture row (min doc_id tie)."""
    full = QUERIES["url_canonicalize"](spark, sf_dir).select(
        "doc_id", "canon_url"
    )
    winners = QUERIES["dedup_url_latest"](spark, sf_dir).toPandas()
    groups = full.toPandas()
    groups["capture"] = (groups["doc_id"].astype("int64") * 1000003) % 97
    expect = (
        groups.sort_values(
            ["canon_url", "capture", "doc_id"],
            ascending=[True, False, True],
        )
        .groupby("canon_url", as_index=False)
        .first()
    )
    got = winners.sort_values("canon_url").reset_index(drop=True)
    want = expect.sort_values("canon_url").reset_index(drop=True)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    # one winner per distinct canonical url
    assert len(got) == groups["canon_url"].nunique()


def test_normalize_text_rules(spark):
    cases = [
        # decomposed e + combining acute -> precomposed; BEL stripped;
        # tabs/newlines/runs collapsed; ends trimmed
        ("Cafe\u0301\t\x07 x", "Caf\u00e9 x"),
        ("  a \n\n b\r\n", "a b"),
        ("\x00\x1fkeep\x7f", "keep"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["t"]).select(
        normalize_text_expr(F.col("t")).alias("n")
    )
    assert [r.n for r in df.collect()] == [w for _, w in cases]


def test_lang_rebalance_counts_and_plan(spark, sf_dir):
    got = QUERIES["lang_rebalance"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    import numpy as np

    per_lang = docs.groupby("lang").size()
    kept = got.groupby("lang").size().reindex(per_lang.index).fillna(0)
    for lang, n_l in per_lang.items():
        keep_n = min(n_l, 4 * int(np.floor(np.sqrt(n_l))))
        # binomial(n_l, keep_n/n_l): allow 4 sigma around the target
        sigma = np.sqrt(keep_n * max(1 - keep_n / n_l, 0.0))
        assert abs(kept[lang] - keep_n) <= max(4 * sigma, 3), (
            lang,
            kept[lang],
            keep_n,
        )
    # head language (en) must be downsampled hardest in relative terms
    rates = (kept / per_lang).sort_values()
    assert rates.index[0] == "en"
    # corpus side joins the 5-row dim by broadcast, never sort-merge
    plan = (
        QUERIES["lang_rebalance"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["url_canonicalize", "dedup_url_latest", "host_blocklist",
     "lang_rebalance", "normalize_text"],
)
def test_new_queries_run_nonempty(spark, sf_dir, name):
    assert QUERIES[name](spark, sf_dir).count() > 0
