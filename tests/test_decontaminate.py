"""Decontamination: scale-shape gates (the oracle value check runs through
tools/check_oracles.py / the driver gate like every other registered query)."""

from __future__ import annotations

from tests.test_plans import plan_of


def test_decontaminate_plan_shape(spark, sf_dir):
    """The eval n-gram set is broadcast (training side never shuffles for
    the join); no cartesian anywhere; the documents scan reads only the two
    columns the query needs."""
    from isimip_qa_spark.queries.decontaminate import decontaminate

    plan = plan_of(decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all(
        "doc_id" in ln and "text" in ln and "lang" not in ln
        for ln in scan_lines
    )


def test_decontaminate_flags_planted_pair(spark, tmp_path):
    """A training doc sharing a 13-gram with an eval doc is flagged with the
    exact distinct-shared-gram count; disjoint docs are not."""
    import pandas as pd

    from isimip_qa_spark.queries.decontaminate import EVAL_MOD, decontaminate

    shared = " ".join(f"w{i}" for i in range(13))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],  # 0 → eval side (0 % EVAL_MOD == 0)
            "text": [
                "prefix " + shared + " suffix",
                shared + " trailing words here",  # contaminated: 1 shared 13-gram
                "completely different text " * 5,
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0] * 3,
        }
    )
    assert 1 % EVAL_MOD != 0 and 2 % EVAL_MOD != 0
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    docs.to_parquet(d + "/documents.parquet")
    out = decontaminate(spark, d).collect()
    assert [(r.doc_id, r.n_hits) for r in out] == [(1, 1)]
