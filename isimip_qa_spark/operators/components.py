"""Connected components over duplicate-pair edges — the cluster-assignment
step a dedup pipeline needs after pair generation (pairs alone don't tell a
trainer which docs to drop; the canonical doc per *component* does, since
near-dup similarity is not transitive and A~B, B~C with A≁C must still
collapse to one cluster).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
ACM SoCC 2014). Each round is two hash aggregations + exchange-reusing
joins on 8-byte node ids; the edge set converges to stars (child → root)
in O(log² n) rounds regardless of component diameter — unlike plain label
propagation, whose round count is the graph diameter (a linked chain of
near-dup docs, common in template families, would take O(n) rounds).

Scale shape per round: `Exchange(hashpartitioning(u))` feeding both the
min-aggregate and the join probe (ReusedExchange), nothing wider than
(long, long) rows ever shuffles, and lineage is truncated every round with
an eager localCheckpoint so the plan stays O(1) deep instead of O(rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (u=min, v=max), self-loops dropped."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For every node u: connect each strictly-larger neighbor v to
    m = min(Γ(u) ∪ {u})."""
    b = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        b.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        b.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Direct each edge large→small, then for every node u: connect each
    (smaller) neighbor and u itself to m = min(Γ(u) ∪ {u})."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = d.groupBy("u").agg(F.min("v").alias("m"))  # m < u by construction
    return (
        d.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 64
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; the component
    id is the minimum node id in the component (deterministic, so the
    result is oracle-comparable). Nodes in no edge simply don't appear —
    callers attach singletons with a left join (see dedup_clusters).

    Driver-side iteration with a per-round convergence probe (count +
    content-hash-sum of the canonical edge set — one tiny aggregate row per
    round, never the edges themselves); the paper bounds rounds at
    O(log² n), observed ≤ 5 on dup-cluster graphs."""
    e = _canon(edges, src, dst).localCheckpoint(eager=True)
    prev: tuple | None = None
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent content fingerprint that cannot
            # overflow (a sum of 64-bit hashes would, under ANSI mode)
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        cur = (sig["n"], sig["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    # converged state is a star forest directed large→small: (child, root).
    # Roots appear only on the v side; add their self-assignments.
    stars = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().join(
        stars.select(F.col("node")), "node", "left_anti"
    )
    return stars.union(
        roots.select("node", F.col("node").alias("component"))
    )
