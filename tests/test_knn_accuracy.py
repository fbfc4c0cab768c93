"""kNN label-accuracy eval: analytic answers on planted orthogonal
clusters — one clean holdout, one mislabeled holdout (accuracy must drop),
and a colinear group exercising BOTH deterministic tie-breaks (equal sims
→ lowest vec_id wins the neighbor cut; split vote → smallest label wins).
The eval side is vec_id < KNN_EVAL_N (a FIXED size, never a fraction of
the table); train ids here all sit above that boundary."""

from __future__ import annotations

import pytest

from isimip_qa_spark.queries.ann import DIM, KNN_EVAL_N, knn_label_accuracy


def _axis(d: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[d] = scale
    return v


B = KNN_EVAL_N  # train ids start here

# (vec_id, embedding, label)
VECS = (
    # cluster A on axis 0: holdout 0 (label 0) + 4 train vectors (label 0)
    [(0, _axis(0), 0)]
    + [(B + i, _axis(0, 1.0 + 0.1 * i), 0) for i in (1, 2, 3, 4)]
    # cluster B on axis 1: holdout 1 is MISLABELED (true label 7, sits in
    # the label-1 cluster) + 4 train vectors (label 1)
    + [(1, _axis(1), 7)]
    + [(B + i, _axis(1, 1.0 + 0.1 * i), 1) for i in (6, 7, 8, 9)]
    # colinear group on axis 2 (all pairwise sims exactly 1.0): holdout 2
    # (label 2) + 6 train vectors. Neighbor cut = 5 LOWEST train ids
    # {B+11..B+15} → labels {2:2, 5:2, 9:1} → vote tie 2 vs 5 → smallest
    # label (2) wins: correct.
    + [(2, _axis(2), 2)]
    + [
        (B + i, _axis(2, 1.0 + 0.1 * i), lab)
        for i, lab in [(11, 2), (12, 2), (13, 5), (14, 5), (15, 9), (16, 9)]
    ]
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("knn"))
    spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def test_per_label_accuracy_analytic(spark, planted_dir):
    got = {
        r["label"]: (r["n_eval"], r["n_correct"], r["accuracy"])
        for r in knn_label_accuracy(spark, planted_dir).collect()
    }
    assert got == {
        0: (1, 1, 1.0),  # clean cluster: predicted 0, true 0
        2: (1, 1, 1.0),  # vote tie 2-vs-5 broken to the smaller label
        7: (1, 0, 0.0),  # mislabeled point: kNN says 1, truth says 7
    }


def test_holdout_side_is_broadcast(spark, planted_dir):
    plan = (
        knn_label_accuracy(spark, planted_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # fixed-size eval set broadcast against a single train-side scan — the
    # train side must never shuffle its vectors
    assert "BroadcastNestedLoopJoin" in plan
