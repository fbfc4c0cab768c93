"""Spherical k-means trainer for the IVF coarse quantizer.

`queries/ann.py` seeds its quantizer with k fixed corpus vectors so the
DuckDB twin can reproduce assignment exactly, and notes a production
deployment would train real centroids. This module IS that trainer,
DataFrame-native (no pyspark.ml dependency), so the swap is in-repo:
`train_centroids` returns a (k × dim) list the IVF/semantic queries can
broadcast unchanged.

Algorithm: Lloyd iterations under the cosine objective (spherical
k-means). Assignment reuses the exact production kernel the queries
probe with (`_ivf_probe_series`, ties → lower centroid id), so a trained
quantizer and the query-side assignment can never disagree. The update
step is the per-cell mean of the NORMALISED members — Σ v/|v| is the
direction maximising the cell's summed cosine, which gives the textbook
monotone non-decreasing objective for arbitrary-norm inputs (a mean of
raw vectors would weight each member by its norm and can decrease the
cosine objective when norms are heterogeneous; asserted in tests with a
deliberately mixed-norm corpus). Zero-norm vectors contribute nothing
to the update (their direction is undefined) but still get assigned via
the kernel's deterministic all-nan tie-break.

Scale shape per iteration (10^12 rows):
- Assignment: ONE corpus pass, vectorized Arrow kernel, centroids
  broadcast (k·dim doubles — a model artifact, like the perplexity
  table).
- Update: posexplode to (cell, dim, x) feeding a hash agg keyed on
  (cell, dim) — cardinality k·dim (~1-100k rows), map-side combine
  collapses every task's contribution before the one exchange; k·dim
  (sum, count) rows reach the driver, never vectors.
- Empty cells keep their previous centroid (deterministic, no
  re-seeding randomness).
- Convergence: fixed iteration budget + early stop when assignments'
  (count, checksum) fingerprint repeats — one tiny aggregate row per
  iteration, the connected-components probe discipline
  (operators/components.py).

Determinism: seeded init (first k vectors by id), deterministic
tie-breaks, fixed fold order inside the kernel — retraining on the same
corpus yields bit-identical centroids, so artifacts are cacheable under
the config-hash contract (plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(e: DataFrame, cids: list[int], cvecs: list[list[float]]) -> DataFrame:
    from ..queries.ann import _ivf_probe_udf

    return e.select(
        "vec_id",
        "v",
        _ivf_probe_udf(F.col("v"), cids, cvecs, 1).getItem(0).alias("cell"),
    )


def train_centroids(
    e: DataFrame,
    k: int,
    n_iters: int = 10,
) -> tuple[list[int], list[list[float]]]:
    """Train k centroids over (vec_id, v) rows; returns (ids, vectors)
    with ids 0..k-1. Init: the k smallest vec_ids' vectors (seeded,
    deterministic)."""
    first = e.orderBy("vec_id").limit(k).collect()
    if len(first) < k:
        raise ValueError(f"need >= {k} vectors, got {len(first)}")
    cids = list(range(k))
    cvecs = [list(r["v"]) for r in first]

    prev_sig: tuple | None = None
    for _ in range(n_iters):
        assigned = _assign(e, cids, cvecs).localCheckpoint(eager=False)
        sig_row = assigned.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(vec_id, cell))").alias("h"),
        ).first()
        sig = (sig_row["n"], sig_row["h"])
        # update BEFORE the convergence break so centroids always match
        # the latest assignment
        norm = F.sqrt(
            F.aggregate(
                F.col("v"), F.lit(0.0), lambda a, x: a + x * x
            )
        )
        stats = (
            assigned.filter(norm > 0)
            .select(
                "cell",
                F.posexplode(
                    F.transform(F.col("v"), lambda x: x / norm)
                ).alias("dim", "x"),
            )
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )  # <= k*dim rows; members enter the update direction-only
        by_cell: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = r["s"] / r["n"]
        dim = len(cvecs[0])
        cvecs = [
            [by_cell[c].get(d, 0.0) for d in range(dim)]
            if c in by_cell
            else cvecs[c]  # empty cell: keep previous centroid
            for c in cids
        ]
        if sig == prev_sig:
            break
        prev_sig = sig
    return cids, cvecs


def quantization_objective(
    e: DataFrame, cids: list[int], cvecs: list[list[float]]
) -> float:
    """Mean cosine similarity of every vector to its assigned centroid —
    the spherical k-means objective (higher is better)."""
    from ..queries.ann import _dot

    a = _assign(e, cids, cvecs)
    cdf = a.sparkSession.createDataFrame(
        [(i, v) for i, v in zip(cids, cvecs)], "cell long, cv array<double>"
    )
    sims = a.join(F.broadcast(cdf), "cell").select(
        (
            _dot(F.col("v"), F.col("cv"))
            / (
                F.sqrt(_dot(F.col("v"), F.col("v")))
                * F.sqrt(_dot(F.col("cv"), F.col("cv")))
            )
        ).alias("sim")
    )
    return sims.agg(F.avg("sim")).first()[0]
