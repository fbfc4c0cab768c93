"""kNN label-accuracy eval: analytic answers on planted orthogonal
clusters — one clean holdout, one mislabeled holdout (accuracy must drop),
a colinear group exercising BOTH deterministic tie-breaks (equal sims →
lowest vec_id wins the neighbor cut; split vote → smallest label wins),
and an id-offset corpus proving the eval cut is RANK-based (the
KNN_EVAL_N smallest ids), not a dense-from-zero assumption."""

from __future__ import annotations

import pytest

from isimip_qa_spark.queries.ann import DIM, KNN_EVAL_N, knn_label_accuracy


def _axis(d: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[d] = scale
    return v


def _vecs(offset: int = 0):
    """(vec_id, embedding, label): eval side = the KNN_EVAL_N smallest ids
    (0..99 before offset) — 3 meaningful holdouts + 97 axis-3 padding;
    train side starts at 101."""
    rows = [
        (0, _axis(0), 0),  # clean: sits in the label-0 cluster
        (1, _axis(1), 7),  # MISLABELED: sits in the label-1 cluster
        (2, _axis(2), 2),  # vote-tie case (colinear train group)
    ]
    rows += [(i, _axis(3), 99) for i in range(3, KNN_EVAL_N)]  # padding
    rows += [(101 + i, _axis(0, 1.1 + 0.1 * i), 0) for i in range(4)]
    rows += [(106 + i, _axis(1, 1.1 + 0.1 * i), 1) for i in range(4)]
    # colinear on axis 2 (all sims exactly 1.0): the 5 lowest ids
    # {111..115} carry labels {2:2, 5:2, 9:1} → tie 2-vs-5 → 2 wins
    rows += [
        (111 + i, _axis(2, 1.1 + 0.1 * i), lab)
        for i, lab in enumerate([2, 2, 5, 5, 9, 9])
    ]
    rows += [(121 + i, _axis(3, 1.1 + 0.1 * i), 99) for i in range(5)]
    return [(vid + offset, emb, lab) for vid, emb, lab in rows]


EXPECTED = {
    0: (1, 1, 1.0),  # clean cluster: predicted 0, true 0
    2: (1, 1, 1.0),  # vote tie 2-vs-5 broken to the smaller label
    7: (1, 0, 0.0),  # mislabeled point: kNN says 1, truth says 7
    99: (97, 97, 1.0),  # padding evals all nearest their own cluster
}


def _write(spark, out: str, offset: int = 0) -> str:
    spark.createDataFrame(
        _vecs(offset), "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    return _write(spark, str(tmp_path_factory.mktemp("knn")))


def _accuracy(spark, d):
    return {
        r["label"]: (r["n_eval"], r["n_correct"], r["accuracy"])
        for r in knn_label_accuracy(spark, d).collect()
    }


def test_per_label_accuracy_analytic(spark, planted_dir):
    assert _accuracy(spark, planted_dir) == EXPECTED


def test_eval_cut_is_rank_based_not_dense_from_zero(spark, tmp_path):
    """Shifting every vec_id by 10^6 must not change the report: a
    `vec_id < KNN_EVAL_N` cut would yield an EMPTY eval set here and an
    empty result that the shared-assumption oracle could not catch."""
    d = _write(spark, str(tmp_path / "off"), offset=1_000_000)
    assert _accuracy(spark, d) == EXPECTED


def test_holdout_side_is_broadcast(spark, planted_dir):
    plan = (
        knn_label_accuracy(spark, planted_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # fixed-size eval set broadcast against a single train-side scan — the
    # train side must never shuffle its vectors; the eval cut itself must
    # be a distributed partial top-N, never a global sort
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
