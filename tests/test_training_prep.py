"""training_prep composition: plan-shape and stage-consistency gates (the
chained value check runs through tools/check_oracles.py)."""

from __future__ import annotations

from tests.test_plans import plan_of


def test_training_prep_plan_shape(spark, sf_dir):
    """Both decontamination joins are broadcast (the corpus never shuffles
    for them); no sort-merge join, no cartesian anywhere."""
    from isimip_qa_spark.queries.training_prep import training_prep

    plan = plan_of(training_prep(spark, sf_dir))
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in body
    assert "CartesianProduct" not in body
    assert "BroadcastNestedLoopJoin" not in body


def test_training_prep_is_consistent_with_stages(spark, sf_dir):
    """Every selected doc must individually pass each stage's registered
    query: gopher keep, classifier keep_ml, dedup rank 1, not contaminated,
    in the sample bucket, and not on the eval side."""
    from isimip_qa_spark.queries.decontaminate import EVAL_MOD, decontaminate
    from isimip_qa_spark.queries.dedup import dedup_exact
    from isimip_qa_spark.queries.mixing import deterministic_sample
    from isimip_qa_spark.queries.textmodel import quality_classifier
    from isimip_qa_spark.queries.training_prep import training_prep
    from isimip_qa_spark.queries.webtext import gopher_rules

    sel = {r.doc_id for r in training_prep(spark, sf_dir).collect()}
    assert sel  # non-degenerate at sf0.001+

    keep = {r.doc_id for r in gopher_rules(spark, sf_dir).collect() if r.keep}
    ml = {
        r.doc_id
        for r in quality_classifier(spark, sf_dir).collect()
        if r.keep_ml
    }
    rank1 = {
        r.doc_id for r in dedup_exact(spark, sf_dir).collect() if r.dup_rank == 1
    }
    contaminated = {r.doc_id for r in decontaminate(spark, sf_dir).collect()}
    sampled = {r.doc_id for r in deterministic_sample(spark, sf_dir).collect()}

    assert sel <= keep and sel <= ml and sel <= sampled
    assert not (sel & contaminated)
    assert all(d % EVAL_MOD != 0 for d in sel)
    # reps are min-id per text among KEPT docs; any selected doc that is
    # also corpus-wide rank-1 is consistent, and none may duplicate a
    # smaller kept doc's text — cheapest faithful check: selected ids are
    # min over their text group within the kept set
    assert sel <= {
        min(g)
        for g in _text_groups(spark, sf_dir, keep & ml).values()
    }


def _text_groups(spark, sf_dir, ids):
    from isimip_qa_spark.catalog import read_table

    rows = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    groups: dict[str, set] = {}
    for r in rows:
        if r.doc_id in ids:
            groups.setdefault(r.text, set()).add(r.doc_id)
    return groups
