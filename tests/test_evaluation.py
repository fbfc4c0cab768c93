"""The evaluation operators' math, checked against brute force:

- quality_auc == O(n²) pair counting over the same binned scores
  (concordant + half of ties, per lang),
- rule_agreement kappa == the textbook formula computed in Python floats
  from per-doc labels,
- the AUC window runs over the aggregated (lang, bin) table, never
  corpus rows (bounded-by-construction claim).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from isimip_qa_spark.queries.evaluation import (
    AUC_BINS,
    QUALITY_TAU,
    quality_auc,
    rule_agreement,
)

SF_DIR = "/root/testdata/sf0.001"


def _per_doc(con) -> pd.DataFrame:
    from isimip_qa_spark.queries.webtext import _GOPHER_SQL, QUALITY_SQL

    return con.execute(
        f"""
        WITH g AS ({_GOPHER_SQL})
        SELECT d.lang,
               least(CAST(floor(({QUALITY_SQL}) * {AUC_BINS}) AS BIGINT),
                     {AUC_BINS - 1}) AS bin,
               ({QUALITY_SQL}) >= {QUALITY_TAU} AS score_keep,
               g.keep
        FROM documents d JOIN g USING (doc_id)
        """
    ).df()


def test_auc_equals_bruteforce_pairs(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    pdf = _per_doc(con)
    got = {r.lang: r.auc for r in quality_auc(spark, SF_DIR).collect()}
    for lang, grp in pdf.groupby("lang"):
        pos = grp[grp.keep].bin.to_numpy()
        neg = grp[~grp.keep].bin.to_numpy()
        num = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
        want = num / (2 * len(pos) * len(neg)) if len(pos) and len(neg) else None
        assert got[lang] == want  # exact: same int numerator, one division


def test_kappa_equals_textbook_formula(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    pdf = _per_doc(con)
    got = {r.lang: r for r in rule_agreement(spark, SF_DIR).collect()}
    for lang, grp in pdf.groupby("lang"):
        a = int(((grp.keep) & (grp.score_keep)).sum())
        b = int(((grp.keep) & (~grp.score_keep)).sum())
        c = int(((~grp.keep) & (grp.score_keep)).sum())
        d = int(((~grp.keep) & (~grp.score_keep)).sum())
        r = got[lang]
        assert (r.n_both_keep, r.n_rules_only, r.n_score_only, r.n_both_drop) == (
            a, b, c, d,
        )
        n = a + b + c + d
        pe_num = (a + b) * (a + c) + (c + d) * (b + d)
        want = None if n * n == pe_num else (n * (a + d) - pe_num) / (n * n - pe_num)
        assert r.kappa == want


def test_auc_window_is_post_aggregation(spark):
    """The cum_neg window must consume the (lang, bin) aggregate, not
    corpus rows: in the physical plan the Window sits above a
    HashAggregate, and below the Window there is exactly one scan."""
    plan = (
        quality_auc(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:]  # aggregate feeds the window
    assert plan.count("Scan parquet") == 1  # one corpus scan total


def test_nb_f1_consistent_with_scores(spark, sf_dir):
    """nb_f1's one-row confusion must equal the confusion recomputed from
    the per-doc quality_nb_score output, and F1 must match its formula."""
    from isimip_qa_spark.queries.textmodel import nb_f1, quality_nb_score

    rows = quality_nb_score(spark, sf_dir).collect()
    assert rows
    tp = sum(1 for r in rows if r["nb_keep"] and r["heur_keep"])
    fp = sum(1 for r in rows if r["nb_keep"] and not r["heur_keep"])
    fn = sum(1 for r in rows if not r["nb_keep"] and r["heur_keep"])
    tn = sum(1 for r in rows if not r["nb_keep"] and not r["heur_keep"])
    got = nb_f1(spark, sf_dir).collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert got["f1"] == round(2 * tp / (2 * tp + fp + fn), 6)
    # the distilled gate must be meaningfully better than chance on its
    # own training distribution (collisions at 2048 buckets cost recall,
    # but the prior + head buckets carry the signal)
    assert got["f1"] > 0.5

    df = quality_nb_score(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # model + prior broadcast; the only shuffles are the trainer's bucket
    # agg and the per-doc sum — never a corpus-to-corpus sort-merge join
    assert "SortMergeJoin" not in plan
