"""snapshot_diff / quality_train_nb / rule_threshold_sweep: semantic
invariants plus the plan properties that carry to 100 TB (digest computed
map-side below the exchange; bucket-keyed partial aggregation; single-row
sweep agg with no join)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- snapshot_diff ---------------------------------------------------------


def test_snapshot_diff_partitions_the_corpus(spark):
    from isimip_qa_spark.queries.versioning import (
        _NEW_PRED,
        _OLD_PRED,
        snapshot_diff,
    )

    out = snapshot_diff(spark, SF).collect()
    by_status: dict[str, int] = {}
    for r in out:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_docs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_old = docs.filter(F.expr(_OLD_PRED)).count()
    n_new = docs.filter(F.expr(_NEW_PRED)).count()
    # every old page is removed, changed, or unchanged; every new page is
    # added, changed, or unchanged
    assert (
        by_status["removed"] + by_status["changed"] + by_status["unchanged"]
        == n_old
    )
    assert (
        by_status["added"] + by_status["changed"] + by_status["unchanged"]
        == n_new
    )
    # the planted re-crawl (doc_id % 17 == 2) is what `changed` detects:
    # changed == pages in both snapshots with the update marker applied
    n_changed = docs.filter(
        F.expr(f"({_OLD_PRED}) AND ({_NEW_PRED}) AND doc_id % 17 = 2")
    ).count()
    assert by_status["changed"] == n_changed


def test_snapshot_diff_digest_below_exchange(spark):
    """The join input shuffles (doc_id, source, digest) — the md5 Project
    sits under the Exchange, so document text never crosses the wire."""
    from isimip_qa_spark.queries.versioning import snapshot_diff

    plan = plan_of(snapshot_diff(spark, SF))
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    for side in plan.split("SortMergeJoin")[1].split("FileScan")[:2]:
        assert "md5" in side  # digest computed map-side on both sides


# --- quality_train_nb ------------------------------------------------------


def test_nb_counts_are_the_label_conditioned_token_totals(spark):
    from isimip_qa_spark.functions import textstats as ts
    from isimip_qa_spark.queries.textmodel import quality_train_nb

    out = quality_train_nb(spark, SF).collect()
    t_keep = sum(r.n_keep for r in out)
    t_drop = sum(r.n_drop for r in out)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    text = F.col("text")
    totals = docs.select(
        ts.keep_expr(text).alias("keep"),
        F.size(ts.tokens_expr(text)).cast("long").alias("n"),
    ).agg(
        F.sum(F.when(F.col("keep"), F.col("n")).otherwise(0)).alias("k"),
        F.sum(F.when(F.col("keep"), 0).otherwise(F.col("n"))).alias("d"),
    ).collect()[0]
    assert t_keep == totals.k and t_drop == totals.d
    # Laplace smoothing: probabilities are strictly positive and, over the
    # OBSERVED buckets, sum to (t_class + n_observed)/(t_class + N_BUCKETS)
    from isimip_qa_spark.queries.textmodel import N_BUCKETS, _SMOOTH

    s = sum(r.p_keep for r in out)
    expect = (t_keep + _SMOOTH * len(out)) / (t_keep + _SMOOTH * N_BUCKETS)
    assert abs(s - expect) < 1e-9


def test_nb_plan_partial_agg_single_corpus_pass(spark):
    from isimip_qa_spark.queries.textmodel import quality_train_nb

    plan = plan_of(quality_train_nb(spark, SF))
    # token stream collapses map-side before the one bucket-keyed exchange
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    # class totals are a window over the aggregated (≤ N_BUCKETS row)
    # table, NOT a re-aggregate + join that would evaluate the corpus
    # scan+explode a second time
    assert plan.count("FileScan") == 1
    assert "Join" not in plan


# --- rule_threshold_sweep --------------------------------------------------


def test_sweep_monotone_and_anchored(spark):
    from isimip_qa_spark.queries.webtext import rule_threshold_sweep

    rows = rule_threshold_sweep(spark, SF).collect()
    by_rule: dict[str, list] = {}
    for r in rows:
        by_rule.setdefault(r.rule, []).append(r)
    for rule, rs in by_rule.items():
        rs.sort(key=lambda r: r.threshold)
        rates = [r.pass_rate for r in rs]
        # tightening a min-threshold can only drop the pass rate
        assert rates == sorted(rates, reverse=True), rule
        assert all(r.n_docs == rs[0].n_docs for r in rs)
    # the current production thresholds appear in the sweep, so the report
    # brackets the shipped config
    assert any(
        r.rule == "stopword_ratio" and r.threshold == 0.01 for r in rows
    )
    assert any(r.rule == "min_words" and r.threshold == 50.0 for r in rows)


def test_sweep_plan_no_join_single_row_exchange(spark):
    from isimip_qa_spark.queries.webtext import rule_threshold_sweep

    plan = plan_of(rule_threshold_sweep(spark, SF))
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan  # only SinglePartition
    assert "partial_sum" in plan
    assert "ReadSchema: struct<text:string>" in plan  # one pruned scan
