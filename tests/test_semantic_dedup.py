"""SemDeDup planted-pair recall: near-identical vectors assigned to the
same cell must be reported above the semantic threshold; similar vectors
straddling two cells must NOT be (the documented cluster-blocking recall
contract — the multiprobe query covers that band)."""

from __future__ import annotations

import math

from isimip_qa_spark.queries.ann import DIM, SEM_THRESHOLD, semantic_pairs


def _unit(axis: int, tilt: float = 0.0, tilt_axis: int = 1) -> list[float]:
    v = [0.0] * DIM
    v[axis] = math.cos(tilt)
    v[tilt_axis] = math.sin(tilt)
    return v


def test_semantic_pairs_planted(spark):
    # centroids: two orthogonal cells
    cids = [100, 101]
    cvecs = [_unit(0), _unit(4, tilt_axis=5)]
    rows = [
        # pair inside cell 100: cos = cos(0.1) ~= 0.995 >= 0.8
        (1, _unit(0, 0.00, 2)),
        (2, _unit(0, 0.10, 2)),
        # vector in cell 101, far from everything in its cell
        (3, _unit(4, 0.0, 5)),
        # straddling pair: ~45 degrees between the two centroids, one
        # lands in each cell -> blocked apart even though cos >= 0.8
        (4, [0.72 * a + 0.70 * b for a, b in zip(cvecs[0], cvecs[1])]),
        (5, [0.70 * a + 0.72 * b for a, b in zip(cvecs[0], cvecs[1])]),
    ]
    e = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, v array<double>"
    )
    got = {
        (r.id_a, r.id_b): r.sim
        for r in semantic_pairs(e, cids, cvecs, SEM_THRESHOLD).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.99
    # doc 3 pairs with nothing in its cell
    assert not any(3 in p for p in got)
    # the straddling pair is similar (cos ~= 1) but cluster-blocked:
    # vec 4 -> cell 100, vec 5 -> cell 101
    assert (4, 5) not in got


def test_semantic_cell_cap_inert_at_bench_scale(spark):
    """SEM_CELL_CAP must not bite at any tested sf: every cell's occupancy
    stays below the cap, so the capped query equals the uncapped oracle
    semantics (at sf0.1 the old shared BUCKET_CAP=256 silently dropped
    ALL cells of ~312 vecs — this pins the regression)."""
    from pyspark.sql import functions as F

    from isimip_qa_spark.queries.ann import (
        N_CENTROIDS,
        N_QUERIES,
        SEM_CELL_CAP,
        _emb,
        _ivf_probe_udf,
    )

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        e = _emb(spark, sf)
        crows = (
            e.filter(
                (F.col("vec_id") >= N_QUERIES)
                & (F.col("vec_id") < N_QUERIES + N_CENTROIDS)
            )
            .orderBy("vec_id")
            .collect()
        )
        cells = e.select(
            _ivf_probe_udf(
                F.col("v"),
                [r["vec_id"] for r in crows],
                [list(r["v"]) for r in crows],
                1,
            )
            .getItem(0)
            .alias("k")
        )
        occ = cells.groupBy("k").count().agg(F.max("count")).first()[0]
        assert occ < SEM_CELL_CAP, (sf, occ)
