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


def test_split_leakage_plan_shape(spark, sf_dir):
    """Both joins are broadcast (the train side never shuffles its grams);
    only distincts/aggs over holdout-bounded sets may exchange."""
    from isimip_qa_spark.queries.decontaminate import split_leakage

    plan = plan_of(split_leakage(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_split_leakage_planted(spark, tmp_path):
    """Two docs that share one 13-gram but land on opposite sides of the
    real stratified_split boundary are reported with the exact shared-gram
    count; the train-side doc is never reported."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from isimip_qa_spark.functions import textstats as ts
    from isimip_qa_spark.functions.fingerprint import (
        rolling_fingerprint_expr,
    )
    from isimip_qa_spark.queries.decontaminate import (
        SPLIT_BUCKETS,
        TRAIN_BUCKETS,
        split_leakage,
    )

    shared = " ".join(f"q{i}" for i in range(13))
    # search suffixes until we have one train-side and one holdout-side
    # variant of a doc carrying the shared gram (bucket is a pure function
    # of the text, so the probe is deterministic and cached in-session)
    probe = spark.createDataFrame(
        [(i, shared + f" tail{i}") for i in range(400)],
        "doc_id long, text string",
    ).select(
        "doc_id",
        F.pmod(
            rolling_fingerprint_expr(ts.tokens_expr(F.col("text"))),
            F.lit(SPLIT_BUCKETS),
        ).alias("bucket"),
    )
    buckets = {r.doc_id: r.bucket for r in probe.collect()}
    train_i = next(i for i, b in buckets.items() if b < TRAIN_BUCKETS)
    hold_i = next(i for i, b in buckets.items() if b >= TRAIN_BUCKETS)
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [shared + f" tail{train_i}", shared + f" tail{hold_i}"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [0] * 2,
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(d + "/documents.parquet")
    out = [(r.doc_id, r.n_leaked) for r in split_leakage(spark, d).collect()]
    # both variants contain exactly 2 distinct 13-grams: the shared one and
    # the one ending in their distinct tail word -> n_leaked == 1
    assert out == [(1, 1)]
