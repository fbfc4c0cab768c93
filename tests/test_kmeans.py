"""Spherical k-means trainer: planted-cluster recovery, monotone
objective, determinism, and empty-cell stability."""

from __future__ import annotations

import math

from isimip_qa_spark.operators.kmeans import (
    quantization_objective,
    train_centroids,
)
from isimip_qa_spark.queries.ann import DIM


def _vec(axis: int, tilt: float, tilt_axis: int) -> list[float]:
    v = [0.0] * DIM
    v[axis] = math.cos(tilt)
    v[tilt_axis] = math.sin(tilt)
    return v


def _planted(spark, per_cluster: int = 20):
    """Three tight direction-clusters around orthogonal axes 0/2/4, with
    deterministic small tilts and HETEROGENEOUS norms (0.5x-8x — the
    spherical update must be norm-blind); vec_ids interleaved so the
    seeded init starts from a BAD configuration (first 3 vectors are not
    one per cluster)."""
    rows = []
    vid = 0
    for j in range(per_cluster):
        for ci, axis in enumerate((0, 2, 4)):
            tilt = 0.05 * ((j % 5) - 2)  # in [-0.1, 0.1] rad
            scale = (0.5, 1.0, 2.0, 4.0, 8.0)[(j + ci) % 5]
            v = [x * scale for x in _vec(axis, tilt, axis + 1)]
            rows.append((vid, v, ci))
            vid += 1
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, v array<double>"
    )
    truth = {i: c for i, v, c in rows}
    return df, truth


def test_planted_clusters_recovered_and_objective_monotone(spark):
    e, truth = _planted(spark)
    objs = []
    for iters in (1, 2, 4):
        cids, cvecs = train_centroids(e, k=3, n_iters=iters)
        objs.append(quantization_objective(e, cids, cvecs))
    # spherical k-means objective is non-decreasing in iterations
    assert objs[0] <= objs[1] + 1e-12 and objs[1] <= objs[2] + 1e-12

    # after convergence the 3 cells must match the planted partition
    cids, cvecs = train_centroids(e, k=3, n_iters=10)
    from isimip_qa_spark.operators.kmeans import _assign

    got = {r.vec_id: r.cell for r in _assign(e, cids, cvecs).collect()}
    # cells are a relabelling of the truth clusters: same partition
    by_cell: dict[int, set] = {}
    for vid, cell in got.items():
        by_cell.setdefault(cell, set()).add(truth[vid])
    assert len(by_cell) == 3
    for members in by_cell.values():
        assert len(members) == 1  # each cell is exactly one true cluster
    assert quantization_objective(e, cids, cvecs) > 0.995


def test_training_is_deterministic(spark):
    e, _ = _planted(spark)
    _, a = train_centroids(e, k=3, n_iters=5)
    _, b = train_centroids(e, k=3, n_iters=5)
    assert a == b  # bit-identical retrain


def test_empty_cell_keeps_previous_centroid(spark):
    # all vectors identical: every point lands in cell 0 forever; cells
    # 1-2 must retain their init vectors instead of crashing/zeroing
    e = spark.createDataFrame(
        [(i, [1.0] + [0.0] * (DIM - 1)) for i in range(6)],
        "vec_id long, v array<double>",
    )
    cids, cvecs = train_centroids(e, k=3, n_iters=3)
    assert cvecs[1] == [1.0] + [0.0] * (DIM - 1)
    assert cvecs[2] == [1.0] + [0.0] * (DIM - 1)


def test_trained_quantizer_feeds_semantic_dedup(spark):
    """Composition: centroids from train_centroids drop into
    semantic_pairs unchanged. With the planted clusters, a near-identical
    pair inside one true cluster is found; the fixed-seed quantizer from
    a bad init (first 3 interleaved vectors) may put them anywhere, but
    the TRAINED cells must co-locate them."""
    from isimip_qa_spark.queries.ann import semantic_pairs

    e, _ = _planted(spark)
    # plant a near-duplicate pair inside the axis-0 cluster
    extra = spark.createDataFrame(
        [
            (1000, _vec(0, 0.01, 1)),
            (1001, _vec(0, 0.02, 1)),
        ],
        "vec_id long, v array<double>",
    )
    e2 = e.union(extra)
    cids, cvecs = train_centroids(e2, k=3, n_iters=10)
    pairs = {
        (r.id_a, r.id_b): r.sim
        for r in semantic_pairs(e2, cids, cvecs, 0.95).collect()
    }
    assert (1000, 1001) in pairs and pairs[(1000, 1001)] > 0.999
