"""Host-graph PageRank: the link-graph quality prior for crawl curation.

Production crawl pipelines rank hosts by link-graph centrality (Common
Crawl publishes exactly this as its host-level webgraph ranks) and use the
rank as a quality prior beside content rules. The fixture has no outlink
column, so the graph is DERIVED deterministically: each document emits one
outlink from its own host to the host indexed by its content fingerprint
mod |hosts| — a pure function of the corpus, so the DuckDB twin rebuilds
the identical graph. A production run swaps `_edges` for the real
(src_host, dst_host, weight) outlink table; everything downstream — degree
normalisation, the iteration loop, the convergence contract — is unchanged.

Reference analogue: the reference iterates a fixed per-dataset extraction
pipeline and emits one summary artifact per subject
(/root/reference/isimip_qa/main.py:110-135); this is the same shape with
an ITERATIVE fixpoint inside — an algorithm class (loop-until-k over a
shuffle) the reference never needs and the rest of this repo's single-pass
queries don't exercise. Payload operator; no direct reference analogue.

Scale contract:
- Each iteration is exactly one shuffle, keyed on dst host — the canonical
  distributed PageRank shape. The rank table is |hosts| rows (~10^8 at
  crawl scale vs 10^12 docs): here it broadcasts; past broadcast size the
  join flips to shuffle-on-src against an edge table PERSISTED BUCKETED BY
  src, so the per-iteration cost stays one exchange of |hosts| rows.
- ITERS is fixed (not convergence-tested) so the plan is static and the
  DuckDB twin can unroll it; production runs pick ITERS ~ 10-20 or add a
  driver-side delta check between iterations.
- Determinism: per-edge contributions are quantized to the 1/QR dyadic
  grid, so the per-host inbound SUMS are exact in IEEE double regardless
  of accumulation order — the same recipe as the LM logprobs (queries/lm.py)
  with a finer grid because ranks are ~1/|hosts|. Self-loops are KEPT:
  they guarantee every host has outdegree ≥ 1, so there are no dangling
  nodes and no leaked mass to redistribute.
- The host-id assignment (row_number over sorted hosts) is a global window
  over the HOST DIM ONLY — the same cost class as collecting k-means
  centroids; at 10^8 hosts you'd zipWithIndex the sorted dim instead. The
  corpus never sees a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions import textstats as ts
from ..functions.fingerprint import (
    rolling_fingerprint_expr,
    rolling_fingerprint_sql,
)
from . import register
from .webtext import _TOKENS_SQL

ITERS = 3  # fixed so the DuckDB twin unrolls exactly
DAMP = 0.85  # Brin & Page 1998
QR = 1 << 20  # dyadic grid for per-edge contributions (ranks ~ 1/|hosts|)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): one derived outlink per document, weight = number of
    documents voting for that (src → dst) pair. Aggregation is keyed on the
    host pair, so the shuffle carries distinct host pairs, not documents."""
    d = read_table(spark, sf_dir, "documents").select(
        F.col("source").alias("src"),
        rolling_fingerprint_expr(ts.tokens_expr(F.col("text"))).alias("fp"),
    )
    hosts = d.select(F.col("src").alias("host")).distinct()
    nh = hosts.agg(F.count("*").alias("n"))
    dim = hosts.select(
        "host",
        (F.row_number().over(Window.orderBy("host")) - 1).alias("hid"),
    )
    return (
        d.crossJoin(F.broadcast(nh))
        .select("src", F.pmod(F.col("fp"), F.col("n")).alias("hid"))
        .join(F.broadcast(dim), "hid")
        .groupBy("src", F.col("host").alias("dst"))
        .agg(F.count("*").alias("w"))
    )


_EDGES_SQL = f"""
    d AS (SELECT source AS src,
                 {rolling_fingerprint_sql(_TOKENS_SQL)} AS fp
          FROM documents),
    hosts AS (SELECT DISTINCT src AS host FROM d),
    nh AS (SELECT count(*)::BIGINT AS n FROM hosts),
    dim AS (SELECT host,
                   (row_number() OVER (ORDER BY host) - 1)::BIGINT AS hid
            FROM hosts),
    edges AS (
      SELECT d.src, dim.host AS dst, count(*)::BIGINT AS w
      FROM d CROSS JOIN nh
      JOIN dim ON dim.hid = ((d.fp % nh.n) + nh.n) % nh.n
      GROUP BY d.src, dim.host
    ),
    deg AS (SELECT src, sum(w)::BIGINT AS outdeg FROM edges GROUP BY src)"""


def _iter_sql(i: int) -> str:
    """One unrolled PageRank iteration: r{i} from r{i-1}."""
    return f"""
    c{i} AS (
      SELECT e.dst,
             round(r{i - 1}.r * e.w / deg.outdeg * {QR}) / {QR} AS c
      FROM edges e
      JOIN r{i - 1} ON r{i - 1}.host = e.src
      JOIN deg ON deg.src = e.src
    ),
    r{i} AS (
      SELECT h.host,
             round((0.15 / nh.n + {DAMP} * coalesce(s.insum, 0)) * {QR})
               / {QR} AS r
      FROM hosts h CROSS JOIN nh
      LEFT JOIN (SELECT dst, sum(c) AS insum FROM c{i} GROUP BY dst) s
        ON s.dst = h.host
    )"""


@register(
    "host_pagerank",
    oracle=f"""
    WITH {_EDGES_SQL},
    r0 AS (SELECT host, 1.0 / nh.n AS r FROM hosts CROSS JOIN nh),
    {",".join(_iter_sql(i) for i in range(1, ITERS + 1))}
    SELECT r{ITERS}.host, deg.outdeg, round(r{ITERS}.r, 6) AS rank
    FROM r{ITERS} JOIN deg ON deg.src = r{ITERS}.host
    """,
)
def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, outdeg, rank): {ITERS}-iteration PageRank over the derived
    host graph, damping {DAMP}, uniform start 1/|hosts|."""
    out, edges = _pagerank_df(spark, sf_dir)
    # Materialize the |hosts|-row result eagerly, then RELEASE the cached
    # edge table: CacheManager entries are never GC-cleaned, so an unpaired
    # persist leaks executor storage for the session lifetime (bench and
    # the oracle sweep run all queries in one session). localCheckpoint
    # blocks are RDD-level — the ContextCleaner frees them when the result
    # is garbage-collected. The checkpoint is dim-sized by construction;
    # the corpus-derived edges never materialize outside the loop's jobs.
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    return out


def _pagerank_df(spark: SparkSession, sf_dir: str):
    """The lazy PageRank plan plus the persisted edges handle (the caller
    owns the unpersist — host_pagerank pairs it after checkpointing; the
    plan-shape test inspects the plan, then unpersists)."""
    return pagerank_edges(_edges(spark, sf_dir))


def pagerank_edges(edges: DataFrame):
    """PageRank over a caller-supplied (src, dst, w) edge table — the
    production entry point: `_edges` above manufactures a deterministic
    graph for the oracle, a real pipeline passes the outlink table that
    queries/extract.py:extract_links produces from the raw HTML. Node
    contract: every dst must also appear as src with outdegree ≥ 1 (add
    self-loops otherwise) — there is no dangling-mass redistribution.
    Returns (result plan, persisted edges handle); the caller owns the
    unpersist."""
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.sum("w").alias("outdeg"))
    # (src, dst, w, outdeg) — deg is |hosts| rows, broadcast; past broadcast
    # size this is the join that flips to shuffle-on-src (module docstring)
    ed = edges.join(F.broadcast(deg), "src")
    hosts = edges.select(F.col("src").alias("host")).distinct()
    nh = hosts.agg(F.count("*").alias("n"))

    ranks = hosts.crossJoin(F.broadcast(nh)).select(
        "host", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(ITERS):
        contrib = ed.join(
            F.broadcast(ranks.withColumnRenamed("host", "src")), "src"
        ).select(
            "dst",
            (
                F.round(F.col("r") * F.col("w") / F.col("outdeg") * QR) / QR
            ).alias("c"),
        )
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("insum"))
        ranks = (
            hosts.join(F.broadcast(insum), hosts.host == insum.dst, "left")
            .crossJoin(F.broadcast(nh))
            .select(
                "host",
                (
                    F.round(
                        (
                            0.15 / F.col("n")
                            + DAMP * F.coalesce(F.col("insum"), F.lit(0.0))
                        )
                        * QR
                    )
                    / QR
                ).alias("r"),
            )
        )
    out = ranks.join(
        F.broadcast(deg.withColumnRenamed("src", "host")), "host"
    ).select("host", "outdeg", F.round("r", 6).alias("rank"))
    return out, edges
