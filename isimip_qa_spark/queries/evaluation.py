"""Filter-evaluation operators: does the cheap score agree with the rules?

A production curation team runs these constantly: (a) how well does the
continuous quality score *rank* documents against the binary keep label
(ROC-AUC — the fastText-classifier acceptance metric in the north_star),
(b) how far do two gates agree beyond chance (Cohen's kappa), and
(c) is the score *calibrated* (reliability bins: predicted level vs
empirical keep rate). The reference's closest analogue is its test
mechanism comparing extraction outputs against stored expectations
(/root/reference/isimip_qa/tests/test_extractions.py); here the
"expectation" is one labeller and the "extraction" is another. These are
payload metrics — the reference has no runtime evaluation layer.

Both are exact-integer constructions so the cross-engine hash matches:

- AUC: scores are binned to B fixed-width buckets (the binned/tied AUC
  estimator — within-bin pairs count 1/2). All pair counting is int64
  (numer = Σ_bins n_pos·(2·cum_neg_below + n_neg), denom = 2·P·N); the
  only float op is the final division, bit-identical in both engines.
  Scale shape: ONE corpus scan → hash agg keyed (lang, bin) with map-side
  combine (≤ langs·B rows survive), then windows over the aggregated
  table, bounded by B rows per lang BY CONSTRUCTION (the textmodel.py
  N_BUCKETS pattern) — never a window over corpus rows. An exact
  (unbinned) AUC would need a global sort of distinct scores; the binned
  estimator is the 10^12-doc answer and its bias is bounded by the bin
  width (≤ 1/B of the score range per tied pair).
- kappa: a 2×2 confusion matrix per lang from ONE conditional hash agg
  (the corpus crosses one lang-keyed exchange carrying four int64s), then
  kappa = (n·(a+d) − pe_num) / (n² − pe_num) with pe_num =
  (a+b)(a+c) + (c+d)(b+d) — all int64, one final division. int64 products
  overflow beyond ~3·10^9 docs per lang; production promotes the six
  products to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) with the same
  expression tree. ANSI mode makes any overflow loud, never silent.
  The two labellers are the Gopher structural keep gate and the
  thresholded quality-score gate (score ≥ τ) — the decision-level version
  of the AUC question, and the pairing with real variation on the fixture
  corpus (the C4 brace/lorem and repetition gates are constant-true
  there, so they would exercise nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions import textstats as ts
from . import register
from .webtext import _GOPHER_SQL, QUALITY_SQL, quality_expr

AUC_BINS = 512


_AUC_SQL = f"""
    WITH g AS ({_GOPHER_SQL}),
    q AS (
      SELECT d.lang,
             least(CAST(floor(({QUALITY_SQL}) * {AUC_BINS}) AS BIGINT),
                   {AUC_BINS - 1}) AS bin,
             g.keep
      FROM documents d JOIN g USING (doc_id)
    ),
    b AS (
      SELECT lang, bin,
             sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_pos,
             sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_neg
      FROM q GROUP BY lang, bin
    ),
    c AS (
      SELECT lang, bin, n_pos, n_neg,
             coalesce(sum(n_neg) OVER (
               PARTITION BY lang ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_neg
      FROM b
    )
    SELECT lang,
           sum(n_pos)::BIGINT AS n_pos,
           sum(n_neg)::BIGINT AS n_neg,
           CASE WHEN sum(n_pos) = 0 OR sum(n_neg) = 0 THEN NULL
                ELSE sum(n_pos * (2 * cum_neg + n_neg))::DOUBLE
                     / (2 * sum(n_pos) * sum(n_neg))
           END AS auc
    FROM c GROUP BY lang
"""


@register("quality_auc", oracle=_AUC_SQL)
def quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned ROC-AUC of the quality score ranking the Gopher keep label,
    per language. Columns: lang, n_pos, n_neg, auc."""
    d = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    bin_col = F.least(
        F.floor(quality_expr(text) * AUC_BINS).cast("long"),
        F.lit(AUC_BINS - 1),
    )
    keep = ts.keep_expr(text)
    b = (
        d.select("lang", bin_col.alias("bin"), keep.alias("keep"))
        .groupBy("lang", "bin")
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_pos"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).cast("long").alias("n_neg"),
        )
    )
    w = Window.partitionBy("lang").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = b.withColumn("cum_neg", F.coalesce(F.sum("n_neg").over(w), F.lit(0)))
    return c.groupBy("lang").agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.when(
            (F.sum("n_pos") == 0) | (F.sum("n_neg") == 0), F.lit(None)
        )
        .otherwise(
            F.sum(F.col("n_pos") * (2 * F.col("cum_neg") + F.col("n_neg")))
            .cast("double")
            / (2 * F.sum("n_pos") * F.sum("n_neg"))
        )
        .alias("auc"),
    )


QUALITY_TAU = 0.6  # score gate threshold (decision-level twin of the AUC)

_KAPPA_SQL = f"""
    WITH g AS ({_GOPHER_SQL}),
    j AS (
      SELECT d.lang, g.keep AS gk,
             ({QUALITY_SQL}) >= {QUALITY_TAU} AS ck
      FROM documents d JOIN g USING (doc_id)
    ),
    m AS (
      SELECT lang,
             sum(CASE WHEN gk AND ck THEN 1 ELSE 0 END)::BIGINT AS a,
             sum(CASE WHEN gk AND NOT ck THEN 1 ELSE 0 END)::BIGINT AS b,
             sum(CASE WHEN NOT gk AND ck THEN 1 ELSE 0 END)::BIGINT AS c,
             sum(CASE WHEN NOT gk AND NOT ck THEN 1 ELSE 0 END)::BIGINT AS d
      FROM j GROUP BY lang
    )
    SELECT lang,
           a AS n_both_keep, b AS n_rules_only,
           c AS n_score_only, d AS n_both_drop,
           CASE WHEN (a+b+c+d)*(a+b+c+d) = (a+b)*(a+c) + (c+d)*(b+d)
                THEN NULL
                ELSE ((a+b+c+d)*(a+d) - ((a+b)*(a+c) + (c+d)*(b+d)))::DOUBLE
                     / ((a+b+c+d)*(a+b+c+d) - ((a+b)*(a+c) + (c+d)*(b+d)))
           END AS kappa
    FROM m
"""


def _confusion_sql() -> str:
    from .webtext import _langid_sql

    return f"""
    WITH p AS ({_langid_sql()}),
    j AS (
      SELECT d.lang, p.lang_pred
      FROM documents d JOIN p USING (doc_id)
    ),
    m AS (
      SELECT lang, lang_pred, count(*)::BIGINT AS n_docs
      FROM j GROUP BY lang, lang_pred
    )
    SELECT lang, lang_pred, n_docs,
           n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY lang) AS frac
    FROM m
    """


@register("langid_confusion", oracle=_confusion_sql())
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-predicted language confusion matrix — the langid drift
    monitor a crawl QA run reports per snapshot. ONE scan into a hash agg
    keyed (lang, lang_pred) (≤ |langs|² rows survive the map-side
    combine); the per-declared-lang share is a window over that bounded
    aggregate. Prediction is the column-expression argmax
    (functions/langid.py lang_pred_expr), identical to the fused kernel
    (bit-equality tested in test_langid.py's suite)."""
    from ..functions.langid import lang_pred_expr

    d = read_table(spark, sf_dir, "documents")
    m = (
        d.select("lang", lang_pred_expr(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return m.select(
        "lang",
        "lang_pred",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("frac"),
    )


@register("rule_agreement", oracle=_KAPPA_SQL)
def rule_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the Gopher structural keep gate and the
    thresholded quality-score gate, per language, with the full 2×2
    confusion matrix."""
    docs = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    gk = ts.keep_expr(text)
    ck = quality_expr(text) >= QUALITY_TAU

    def n(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    m = docs.select("lang", gk.alias("gk"), ck.alias("ck")).groupBy("lang").agg(
        n(F.col("gk") & F.col("ck")).alias("a"),
        n(F.col("gk") & ~F.col("ck")).alias("b"),
        n(~F.col("gk") & F.col("ck")).alias("c"),
        n(~F.col("gk") & ~F.col("ck")).alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    ntot = a + b + c + d
    pe_num = (a + b) * (a + c) + (c + d) * (b + d)
    return m.select(
        "lang",
        a.alias("n_both_keep"),
        b.alias("n_rules_only"),
        c.alias("n_score_only"),
        d.alias("n_both_drop"),
        F.when(ntot * ntot == pe_num, F.lit(None))
        .otherwise(
            (ntot * (a + d) - pe_num).cast("double") / (ntot * ntot - pe_num)
        )
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Calibration — the third face of score quality beside ranking (AUC) and
# decision agreement (kappa): per score bin, predicted level vs empirical
# keep rate. A curator reads this before trusting a threshold: AUC can be
# high while the score is systematically over-confident in a band.
# Same bounded-aggregate discipline: one scan → (lang, bin) hash agg with
# map-side combine; all rates are single IEEE divisions of exact int64
# sums (bin midpoint is exact dyadic arithmetic), so the twin hash-matches.
# ---------------------------------------------------------------------------

REL_BINS = 16


_RELIABILITY_SQL = f"""
    WITH g AS ({_GOPHER_SQL}),
    q AS (
      SELECT d.lang,
             least(CAST(floor(({QUALITY_SQL}) * {REL_BINS}) AS BIGINT),
                   {REL_BINS - 1}) AS bin,
             g.keep
      FROM documents d JOIN g USING (doc_id)
    )
    SELECT lang, bin,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_keep,
           (bin * 2 + 1)::DOUBLE / {2 * REL_BINS} AS bin_mid,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / count(*)
             AS empirical_keep_rate
    FROM q GROUP BY lang, bin
"""


@register("reliability_bins", oracle=_RELIABILITY_SQL)
def reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, score-bin) calibration: bin midpoint vs empirical
    Gopher-keep rate. Columns: lang, bin, n_docs, n_keep, bin_mid,
    empirical_keep_rate."""
    d = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    bin_col = F.least(
        F.floor(quality_expr(text) * REL_BINS).cast("long"),
        F.lit(REL_BINS - 1),
    )
    return (
        d.select("lang", bin_col.alias("bin"), ts.keep_expr(text).alias("keep"))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_keep"),
        )
        .select(
            "lang",
            "bin",
            "n_docs",
            "n_keep",
            ((F.col("bin") * 2 + 1).cast("double") / F.lit(2 * REL_BINS)).alias(
                "bin_mid"
            ),
            (F.col("n_keep").cast("double") / F.col("n_docs")).alias(
                "empirical_keep_rate"
            ),
        )
    )
