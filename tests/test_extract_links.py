"""Outlink extraction: planted href semantics vs a pure-Python reference,
the one-exchange plan contract, and pagerank_edges running over the REAL
extracted edge table (the swap queries/graph.py documents)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from isimip_qa_spark.functions.extract import extract_link_hosts_expr
from isimip_qa_spark.queries.extract import extract_links
from isimip_qa_spark.queries.graph import QR, pagerank_edges

PLANTED = [
    # (html, base_host, expected hosts)
    (
        '<a href="https://example.com/page">x</a>',
        "me.org",
        ["example.com"],
    ),
    (
        "<A HREF='HTTP://WWW.Example.COM:80/P'>x</A>",
        "me.org",
        ["www.example.com"],  # url_host strips the port by contract
    ),
    ('<a href="/relative">x</a>', "me.org", ["me.org"]),
    ('<a href="#frag">x</a>', "me.org", ["me.org"]),
    ('<a href="mailto:a@b.c">x</a>', "me.org", ["me.org"]),
    ("no links at all", "me.org", []),
    (
        '<a href="https://a.com/1">x</a><a href=\'https://b.com/2\'>y</a>',
        "me.org",
        ["a.com", "b.com"],
    ),
]


def _py_hosts(html: str, base: str) -> list[str]:
    out = []
    for u in re.findall(r"(?i)href=[\"']([^\"']*)[\"']", html):
        if re.match(r"(?i)^https?://", u):
            m = re.match(r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", u.lower())
            out.append(m.group(1) if m else "")
        else:
            out.append(base)
    return out


@pytest.fixture(scope="module")
def planted(spark):
    rows = [(i, h, b) for i, (h, b, _) in enumerate(PLANTED)]
    return spark.createDataFrame(rows, "i long, html string, base string")


def test_extraction_matches_python_reference(planted):
    got = (
        planted.select(
            "i",
            extract_link_hosts_expr(F.col("html"), F.col("base")).alias(
                "hosts"
            ),
        )
        .toPandas()
        .sort_values("i")
    )
    for _, r in got.iterrows():
        html, base, want = PLANTED[int(r["i"])]
        assert list(r["hosts"]) == want
        assert list(r["hosts"]) == _py_hosts(html, base)


def test_plan_one_exchange_no_python(spark, sf_dir):
    plan = (
        extract_links(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # the (src, dst) hash agg only
    assert "Python" not in plan


def test_pagerank_over_extracted_edges(spark, sf_dir):
    """The production swap: the iterative ranker consumes the extracted
    outlink table. Self-loops are added for dangling dst-only hosts (the
    documented node contract), then mass conservation and determinism
    must hold exactly as they do on the derived fixture graph."""
    edges = extract_links(spark, sf_dir).withColumnRenamed("n_links", "w")
    nodes = (
        edges.select(F.col("src").alias("h"))
        .union(edges.select("dst"))
        .distinct()
    )
    self_loops = nodes.select(
        F.col("h").alias("src"), F.col("h").alias("dst"), F.lit(1).alias("w")
    )
    g = edges.unionByName(self_loops)
    out, handle = pagerank_edges(g)
    rows = {r["host"]: r for r in out.collect()}
    handle.unpersist()
    n = len(rows)
    assert n >= 3  # cdn + fingerprint hosts + sources
    ranks = [r["rank"] for r in rows.values()]
    assert abs(sum(ranks) - 1.0) < n * (0.5 / QR + 1e-6) * 3
    # the shared "CDN" host every page cites must outrank the median host
    cdn = rows["cdn.example.org"]["rank"]
    assert cdn > sorted(ranks)[n // 2]
    # deterministic re-run
    out2, handle2 = pagerank_edges(g)
    rows2 = {r["host"]: r["rank"] for r in out2.collect()}
    handle2.unpersist()
    assert rows2 == {h: r["rank"] for h, r in rows.items()}
