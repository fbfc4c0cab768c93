"""Training-data mixing operators over `documents`: deterministic sampling
and token-budgeted selection — the dataset-composition stage that follows
quality filtering and dedup in a web-scale pipeline (the reference's
extraction→assessment chain ends in per-scope summaries; a training
pipeline ends in a *selected subset*, so these are first-class here).

Scale notes:
- deterministic_sample: pure column exprs, no shuffle at all — the sample
  predicate pushes into the scan stage, and reruns are reproducible without
  any seed state (`rand()` is banned: it is neither repeatable across
  retried tasks nor oracle-comparable). The bucket hash is the same exact
  int64 rolling fingerprint both engines compute (functions/fingerprint.py),
  so a doc's sample membership is a pure function of its text.
- token_budget_per_source: ONE exchange keyed on (8-byte) source hash; the
  running total is a window ordered by (quality desc, doc_id) — a per-group
  sort is inherent to exact budget filling. At crawl scale the group key is
  the url host: bounded per-group row counts (a host's docs fit a task),
  with the same hot-host salting discipline the QA pipeline uses for the
  few degenerate hosts; an approximate two-pass variant (quality-threshold
  binary search, no per-group sort) is the relaxation if a group ever
  exceeds task memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions import textstats as ts
from ..functions.fingerprint import (
    rolling_fingerprint_expr,
    rolling_fingerprint_sql,
)
from . import register
from .webtext import QUALITY_SQL, _TOKENS_SQL, quality_expr

SAMPLE_BUCKETS = 1000
SAMPLE_KEEP = 100  # 10% sample
TOKEN_BUDGET = 600  # per-source whitespace-token budget
REBALANCE_SCALE = 4  # lang_rebalance: keep ~SCALE*sqrt(n_l) docs per lang


@register(
    "deterministic_sample",
    oracle=f"""
    SELECT doc_id, bucket
    FROM (
      SELECT doc_id,
             (({rolling_fingerprint_sql(_TOKENS_SQL)} % {SAMPLE_BUCKETS})
              + {SAMPLE_BUCKETS}) % {SAMPLE_BUCKETS} AS bucket
      FROM documents
    )
    WHERE bucket < {SAMPLE_KEEP}
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket sample: keep docs whose content-fingerprint bucket falls
    below the keep threshold. Reproducible, seedless, shuffle-free."""
    d = read_table(spark, sf_dir, "documents")
    fp = rolling_fingerprint_expr(ts.tokens_expr(F.col("text")))
    return (
        d.select("doc_id", F.pmod(fp, F.lit(SAMPLE_BUCKETS)).alias("bucket"))
        .filter(F.col("bucket") < SAMPLE_KEEP)
    )


@register(
    "token_budget_per_source",
    oracle=f"""
    SELECT doc_id, source, ws_tokens, cum_tokens
    FROM (
      SELECT doc_id, source, ws_tokens,
             sum(ws_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM (
        SELECT doc_id, source,
               len({_TOKENS_SQL})::BIGINT AS ws_tokens,
               {QUALITY_SQL} AS quality
        FROM documents
      )
    )
    WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked budget fill: per source, take docs in descending
    quality order until the cumulative whitespace-token count would exceed
    the budget. The canonical data-mixing primitive ("N tokens per domain,
    best first")."""
    d = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    scored = d.select(
        "doc_id",
        "source",
        ts.n_words_expr(text).alias("ws_tokens"),
        quality_expr(text).alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("ws_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "source", "ws_tokens", "cum_tokens")
    )


@register(
    "lang_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*)::BIGINT AS n_l,
             least(count(*)::BIGINT,
                   {REBALANCE_SCALE} * floor(sqrt(count(*)))::BIGINT) AS keep_n
      FROM documents GROUP BY lang
    ),
    bucketed AS (
      SELECT doc_id, lang,
             (({rolling_fingerprint_sql(_TOKENS_SQL)} % {SAMPLE_BUCKETS})
              + {SAMPLE_BUCKETS}) % {SAMPLE_BUCKETS} AS bucket
      FROM documents
    )
    SELECT doc_id, b.lang, bucket
    FROM bucketed b JOIN counts c ON b.lang = c.lang
    WHERE bucket * c.n_l < c.keep_n * {SAMPLE_BUCKETS}
    ORDER BY doc_id
    """,
)
def lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature rebalancing by deterministic downsampling: each language
    keeps ~SCALE*sqrt(n_l) docs (head languages downsampled hardest — the
    alpha=0.5 temperature schedule), selected by the same seedless
    content-fingerprint buckets as deterministic_sample.

    The keep predicate is the integer cross-multiplication
    `bucket * n_l < keep_n * BUCKETS` — exact in int64 on both engines, no
    float rate anywhere (floor(sqrt(int)) is the one float op; IEEE sqrt is
    correctly rounded in both engines so the floor is engine-exact). Scale
    shape: one hash-agg for the 5-row counts dim, broadcast back; the corpus
    crosses no exchange — the filter stays in the scan stage."""
    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_l"))
        .select(
            "lang",
            "n_l",
            F.least(
                F.col("n_l"),
                F.lit(REBALANCE_SCALE)
                * F.floor(F.sqrt(F.col("n_l"))).cast("long"),
            ).alias("keep_n"),
        )
    )
    fp = rolling_fingerprint_expr(ts.tokens_expr(F.col("text")))
    bucketed = d.select(
        "doc_id", "lang", F.pmod(fp, F.lit(SAMPLE_BUCKETS)).alias("bucket")
    )
    return (
        bucketed.join(F.broadcast(counts), "lang")
        .filter(
            F.col("bucket") * F.col("n_l")
            < F.col("keep_n") * F.lit(SAMPLE_BUCKETS)
        )
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    )
