"""Multi-table (rotated) embedding LSH recall: a planted near-duplicate
pair that straddles a rotation-0 hyperplane bucket must be missed by the
single-table query and caught by the multiprobe query, which must equal the
brute-force ground truth on the fixture."""

from __future__ import annotations

import numpy as np
import pytest

from isimip_qa_spark.queries.ann import (
    DIM,
    DUP_COS_THRESHOLD,
    N_PLANES,
    N_ROTATIONS,
    _hyperplanes,
)


def _np_bucket(v: np.ndarray, rotation: int) -> int:
    planes = np.array(_hyperplanes(rotation))  # (P, DIM)
    dots = planes @ v
    return int(sum((1 << p) for p in range(N_PLANES) if dots[p] > 0)) + rotation * (
        1 << N_PLANES
    )


def _make_fixture():
    """Deterministic corpus: 200 well-separated fillers + one near-dup pair
    whose members land in different rotation-0 buckets but share a bucket in
    some rotation >= 1."""
    rng = np.random.default_rng(7)
    fillers = rng.normal(size=(200, DIM))

    planted = None
    for _ in range(500):
        base = rng.normal(size=DIM)
        twin = base + 1e-3 * rng.normal(size=DIM)
        b0 = [_np_bucket(v, 0) for v in (base, twin)]
        if b0[0] == b0[1]:
            continue
        shared = [
            r
            for r in range(1, N_ROTATIONS)
            if _np_bucket(base, r) == _np_bucket(twin, r)
        ]
        if shared:
            planted = (base, twin)
            break
    assert planted is not None, "no straddling near-pair found; change the seed"
    vecs = np.vstack([fillers, planted[0], planted[1]]).astype(np.float32)
    pair_ids = (len(fillers), len(fillers) + 1)
    return vecs, pair_ids


def _ground_truth_pairs(vecs: np.ndarray) -> set[tuple[int, int]]:
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    sims = (v @ v.T) / np.outer(norms, norms)
    n = len(v)
    return {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= DUP_COS_THRESHOLD
    }


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    vecs, pair_ids = _make_fixture()
    d = str(tmp_path_factory.mktemp("emb"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(table, f"{d}/embeddings.parquet")
    return d, vecs, pair_ids


def test_bucket_udf_equals_expression_path(spark, emb_dir):
    """The vectorized numpy bucket kernel (elementwise product + cumsum,
    strict left-to-right) is bit-identical to the F.aggregate fold
    expression for every rotation — the float-parity contract that keeps
    the DuckDB oracle exact."""
    from pyspark.sql import functions as F

    from isimip_qa_spark.queries.ann import (
        N_ROTATIONS,
        _bucket_expr,
        _bucket_keys_udf,
        _emb,
    )

    d, _, _ = emb_dir
    e = _emb(spark, d)
    expr_keys = F.array(
        *[_bucket_expr(F.col("v"), r) for r in range(N_ROTATIONS)]
    )
    j = e.select(
        "vec_id",
        expr_keys.alias("e_keys"),
        _bucket_keys_udf(F.col("v")).alias("u_keys"),
    )
    assert j.filter(F.col("e_keys") != F.col("u_keys")).count() == 0


def test_multiprobe_catches_straddling_pair(spark, emb_dir):
    from isimip_qa_spark.queries.ann import (
        PLANT_BASE,
        dedup_embedding_cosine,
        dedup_embedding_cosine_multiprobe,
    )

    d, vecs, (ia, ib) = emb_dir
    single = {
        (r.id_a, r.id_b) for r in dedup_embedding_cosine(spark, d).collect()
    }
    multi = {
        (r.id_a, r.id_b)
        for r in dedup_embedding_cosine_multiprobe(spark, d).collect()
    }
    # the registered queries union the deterministic plant (ann.plant_rows,
    # ids >= PLANT_BASE) into their input; scope recall claims to fixture ids
    single_fx = {p for p in single if p[0] < PLANT_BASE}
    multi_fx = {p for p in multi if p[0] < PLANT_BASE}
    assert (ia, ib) not in single_fx  # the single-table recall gap, shown
    assert (ia, ib) in multi_fx  # closed by banding over rotations
    assert multi_fx == _ground_truth_pairs(vecs)  # full recall on fixture
    assert single <= multi  # rotations only ever add candidates
    # and the plant itself is caught by BOTH paths (bucket-stable pairs)
    planted = {(PLANT_BASE + 2 * i, PLANT_BASE + 2 * i + 1) for i in range(3)}
    assert planted <= single and planted <= multi
