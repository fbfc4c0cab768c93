"""Corpus datasheet: the model-card statistics table a training-data
release ships (datasheets-for-datasets practice) — per-(lang, source)
volumes, keep-rate under the production rules, and an exact doc-length
histogram.

The reference's analogue is the assessment summary a QA run prints per
dataset (per-extraction stats CSVs, isimip_qa/extractions/*.py); here the
unit is the corpus partition a data curator reasons about.

Cross-engine exactness: all counts are int64 sums; rates and means are
single IEEE divisions of exact ints; the histogram bucket is
length(bin(n_words)) = floor(log2(n)) + 1 — pure integer arithmetic in
both engines (no ln(), whose rounding near bucket edges is unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions import textstats as ts
from . import register

_TOKENS_SQL = "string_split(text, ' ')"


def _keep_sql() -> str:
    # inline the production keep expression by reusing the gopher oracle as
    # a labelled subquery (same pattern as textmodel._nb_sql)
    from .webtext import _GOPHER_SQL

    return _GOPHER_SQL


_DATASHEET_SQL = None  # built lazily below (needs webtext import)


def _datasheet_sql() -> str:
    return f"""
    WITH lbl AS (SELECT doc_id, keep FROM ({_keep_sql()}) g),
    s AS (
      SELECT d.lang, d.source, l.keep,
             len({_TOKENS_SQL})::BIGINT AS n_tokens,
             length(d.text)::BIGINT AS n_chars
      FROM documents d JOIN lbl l ON d.doc_id = l.doc_id
    )
    SELECT lang, source,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           sum(n_chars)::BIGINT AS n_chars,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_keep,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / count(*) AS keep_rate,
           sum(n_tokens)::DOUBLE / count(*) AS mean_doc_tokens
    FROM s GROUP BY lang, source
    ORDER BY lang, source
"""


@register("corpus_datasheet", _datasheet_sql())
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) datasheet row: doc/token/char volumes, keep-rate
    under the production Gopher rules, mean document length.

    Scale shape: one scan computes the keep label, token count, and char
    count in the same projection (the label is an expression, never a
    join); one hash agg keyed on (lang, source) — cardinality is
    languages × sources, so map-side partials collapse everything. The
    rates are computed FROM the aggregated int64 sums, not re-scanned."""
    d = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    s = d.select(
        "lang",
        "source",
        ts.keep_expr(text).alias("keep"),
        F.size(ts.tokens_expr(text)).cast("long").alias("n_tokens"),
        F.length(text).cast("long").alias("n_chars"),
    )
    agg = s.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_keep",
        (F.col("n_keep").cast("double") / F.col("n_docs")).alias("keep_rate"),
        (F.col("n_tokens").cast("double") / F.col("n_docs")).alias(
            "mean_doc_tokens"
        ),
    ).orderBy("lang", "source")


_DOCLEN_SQL = f"""
    WITH s AS (
      SELECT length(bin(len({_TOKENS_SQL})))::BIGINT AS bucket
      FROM documents
    )
    SELECT bucket,
           (1::BIGINT << (bucket - 1)) AS lo_tokens,
           (1::BIGINT << bucket) - 1 AS hi_tokens,
           count(*)::BIGINT AS n_docs
    FROM s GROUP BY bucket ORDER BY bucket
"""


@register("doclen_histogram", _DOCLEN_SQL)
def doclen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length distribution in power-of-two token buckets
    (bucket b covers [2^(b-1), 2^b - 1] tokens).

    The bucket id is length(bin(n)) = floor(log2(n)) + 1 — exact integer
    arithmetic in both engines; a float log2 would round unpredictably at
    bucket edges. One pruned scan, one tiny (≤ 64-key) hash agg with
    map-side partials; the corpus never shuffles row-wise."""
    d = read_table(spark, sf_dir, "documents")
    n = F.size(ts.tokens_expr(F.col("text"))).cast("long")
    bucket = F.length(F.bin(n)).cast("long")
    return (
        d.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "bucket",
            F.expr("shiftleft(1L, cast(bucket as int) - 1)").alias(
                "lo_tokens"
            ),
            F.expr("shiftleft(1L, cast(bucket as int)) - 1L").alias(
                "hi_tokens"
            ),
            "n_docs",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Vocabulary-growth curve (Heaps' law observability): cumulative distinct
# token types vs cumulative token occurrences at DECILES deterministic
# corpus checkpoints (doc_id order). The number tokenizer/vocab sizing and
# dedup-health monitoring read: types growing ~ occurrences^beta is healthy
# crawl; a flattening curve at constant occ growth means the new data is
# duplicate-heavy.
#
# Scale shape: "distinct types seen by checkpoint k" is computed WITHOUT
# any per-checkpoint rescan — each type contributes one row keyed by its
# FIRST checkpoint (min over an int in [1, DECILES]; map-side combine
# collapses each task's token stream to its distinct types), then a
# ≤DECILES-row running sum. Two token-keyed hash aggs over one scan; the
# window sees DECILES rows, never the corpus.
# ---------------------------------------------------------------------------

DECILES = 10


@register(
    "vocab_growth",
    oracle=f"""
    WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
    ex AS (
      SELECT 1 + (doc_id * {DECILES}) // mx.m AS b,
             unnest({_TOKENS_SQL}) AS w
      FROM documents CROSS JOIN mx
    ),
    occ AS (SELECT b, count(*)::BIGINT AS occ FROM ex GROUP BY b),
    tokmin AS (SELECT w, min(b) AS minb FROM ex GROUP BY w),
    nt AS (SELECT minb AS b, count(*)::BIGINT AS new_types
           FROM tokmin GROUP BY minb),
    d AS (SELECT i::BIGINT AS decile FROM unnest(range(1, {DECILES} + 1)) AS u(i))
    SELECT decile,
           CAST(sum(coalesce(occ.occ, 0)) OVER (ORDER BY decile) AS BIGINT)
             AS cum_tokens,
           CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY decile) AS BIGINT)
             AS cum_types
    FROM d LEFT JOIN occ ON occ.b = d.decile LEFT JOIN nt ON nt.b = d.decile
    """,
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, cum_tokens, cum_types): the type/token curve at {DECILES}
    doc_id-order checkpoints."""
    from pyspark.sql.window import Window

    d = read_table(spark, sf_dir, "documents")
    mx = d.agg((F.max("doc_id") + 1).alias("m"))
    ex = d.crossJoin(F.broadcast(mx)).select(
        (1 + F.expr(f"(doc_id * {DECILES}) div m")).alias("b"),
        F.explode(ts.tokens_expr(F.col("text"))).alias("w"),
    )
    occ = ex.groupBy("b").agg(F.count("*").alias("occ"))
    nt = (
        ex.groupBy("w")
        .agg(F.min("b").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("new_types"))
    )
    deciles = spark.range(1, DECILES + 1).withColumnRenamed("id", "decile")
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = (
        deciles.join(F.broadcast(occ), deciles.decile == occ.b, "left")
        .drop("b")
        .join(F.broadcast(nt), deciles.decile == nt.b, "left")
        .drop("b")
    )
    return joined.select(
        "decile",
        F.sum(F.coalesce("occ", F.lit(0))).over(w).cast("long").alias("cum_tokens"),
        F.sum(F.coalesce("new_types", F.lit(0)))
        .over(w)
        .cast("long")
        .alias("cum_types"),
    )
