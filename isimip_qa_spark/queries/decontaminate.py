"""Benchmark decontamination over `documents`.

Training-data pipelines must drop (or at least flag) training documents that
overlap an evaluation benchmark, or downstream eval scores are contaminated.
The standard check (GPT-3 appendix C / PaLM §C) is word-n-gram collision
with n around 13: a training doc is contaminated if it shares at least one
13-gram with any benchmark doc.

Here the "benchmark" set is carved deterministically out of the corpus
itself (doc_id % EVAL_MOD == 0) so the check is self-contained and
oracle-able; in production the eval side is an external benchmark table.

Scale shape (the 100-TB case):
- The eval side is SMALL by construction (benchmarks are MBs, not TBs):
  its distinct n-gram set is broadcast — the training side is never
  shuffled for the join (BroadcastHashJoin, asserted in
  tests/test_decontaminate.py).
- Training-side n-grams are generated inside the map stage (explode over a
  projected 2-column scan) and die there: only the matched rows — bounded
  by |eval n-grams| × duplication, tiny — reach the final groupBy(doc_id)
  exchange.
- At real scale the broadcast set would carry 8-byte xxhash64 keys instead
  of n-gram strings (~6× smaller); strings are joined here so the DuckDB
  twin is collision-exact. Swapping the join key for a hash + string
  verify on match is a local change with the same plan shape.

Reference anchor: the reference has no decontamination (it is a climate-QA
tool); this operator comes from the training-data-pipeline mandate
(SURVEY.md §2.9 extension set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions import textstats as ts
from ..functions.fingerprint import (
    rolling_fingerprint_expr,
    rolling_fingerprint_sql,
    shingles_expr,
)
from . import register

K = 13  # n-gram width (GPT-3's decontamination width)
EVAL_MOD = 10  # doc_id % EVAL_MOD == 0 → benchmark side


def ngrams_sql(tokens_sql: str, k: int) -> str:
    """DuckDB twin of `shingles_expr(tokens, k)` for arbitrary k: 1-based
    inclusive list slice, clamped at the tail exactly like F.slice."""
    t = tokens_sql
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({t}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string({t}[i:i+{k - 1}], ' ')))"
    )


_NG = ngrams_sql("string_split(text, ' ')", K)

_DECON_SQL = f"""
    WITH grams AS (
      SELECT doc_id, unnest({_NG}) AS ng FROM documents
    ),
    ev AS (SELECT DISTINCT ng FROM grams WHERE doc_id % {EVAL_MOD} = 0),
    tr AS (SELECT doc_id, ng FROM grams WHERE doc_id % {EVAL_MOD} <> 0)
    SELECT tr.doc_id AS doc_id, count(*) AS n_hits
    FROM tr JOIN ev USING (ng)
    GROUP BY tr.doc_id
    ORDER BY doc_id
"""


@register("decontaminate", _DECON_SQL)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated training docs: (doc_id, n_hits) where n_hits is the
    number of distinct word-13-grams shared with the benchmark set."""
    grams = (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(shingles_expr(ts.tokens_expr(F.col("text")), k=K)).alias(
                "ng"
            ),
        )
    )
    ev = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("ng").distinct()
    )
    tr = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Split-leakage audit: n-gram contamination across the REAL train/holdout
# boundary produced by stratified_split (queries/mixing.py).
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 100  # keep in sync with mixing.stratified_split
TRAIN_BUCKETS = 96  # bucket < 96 → train; 96-97 valid; 98-99 test

_LEAK_SQL = f"""
    WITH b AS (
      SELECT doc_id,
             ((fp % {SPLIT_BUCKETS}) + {SPLIT_BUCKETS}) % {SPLIT_BUCKETS}
               AS bucket,
             text
      FROM (SELECT doc_id, text,
                   {rolling_fingerprint_sql("string_split(text, ' ')")} AS fp
            FROM documents)
    ),
    grams AS (SELECT doc_id, bucket, unnest({_NG}) AS ng FROM b),
    hg AS (SELECT doc_id, bucket, ng FROM grams
           WHERE bucket >= {TRAIN_BUCKETS}),
    tmatched AS (
      SELECT DISTINCT ng FROM grams
      WHERE bucket < {TRAIN_BUCKETS} AND ng IN (SELECT ng FROM hg)
    )
    SELECT hg.doc_id AS doc_id,
           CASE WHEN hg.bucket < {TRAIN_BUCKETS + 2} THEN 'valid'
                ELSE 'test' END AS split,
           count(*)::BIGINT AS n_leaked
    FROM hg JOIN tmatched USING (ng)
    GROUP BY hg.doc_id, hg.bucket
    ORDER BY doc_id
"""


@register("split_leakage", _LEAK_SQL)
def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, n_leaked): for every holdout (valid/test) document,
    how many of its distinct word-13-grams also occur in some TRAIN
    document — the contamination audit for the split `stratified_split`
    actually ships.

    stratified_split's fingerprint bucketing makes exact-duplicate leakage
    impossible by construction (identical text → identical bucket), so what
    this measures is the residual channel: near-duplicates and shared
    boilerplate that differ enough to fingerprint apart but still share
    13-grams. n_leaked > 0 does not mean "remove the doc" — it is the
    per-doc severity the curation pass thresholds on (the same role
    `decontaminate`'s n_hits plays for external benchmarks).

    Scale shape (100 TB): the holdout is 4% of the corpus by construction
    and benchmark-sized in practice. Train-side grams are generated in the
    map stage and immediately filtered by a BROADCAST of the distinct
    holdout grams — the train side never shuffles (asserted in
    tests/test_decontaminate.py); only matched grams (≤ |holdout grams|)
    reach the distinct, and the final per-doc count joins two
    holdout-bounded sides. Same hash-key upgrade path as `decontaminate`:
    at production scale the broadcast carries xxhash64(ng), strings here
    keep the DuckDB twin collision-exact."""
    d = read_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        rolling_fingerprint_expr(ts.tokens_expr(F.col("text"))),
        F.lit(SPLIT_BUCKETS),
    )
    grams = d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.explode(shingles_expr(ts.tokens_expr(F.col("text")), k=K)).alias(
            "ng"
        ),
    )
    hg = grams.filter(F.col("bucket") >= TRAIN_BUCKETS)
    hng = hg.select("ng").distinct()
    tmatched = (
        grams.filter(F.col("bucket") < TRAIN_BUCKETS)
        .join(F.broadcast(hng), "ng")
        .select("ng")
        .distinct()
    )
    return (
        hg.join(F.broadcast(tmatched), "ng")
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n_leaked"))
        .select(
            "doc_id",
            F.when(F.col("bucket") < TRAIN_BUCKETS + 2, "valid")
            .otherwise("test")
            .alias("split"),
            "n_leaked",
        )
        .orderBy("doc_id")
    )
