"""Run-over-run QA metrics drift report.

A crawl team reruns the pipeline after a config, model, or corpus change
and asks: what moved — keep rate, perplexity, scrub volume — and where?
The reference answers this question one dataset at a time through its
test mechanism — extraction outputs compared against stored expectations
(isimip_qa/tests/test_extractions.py); here it's answered
metrics-table-to-metrics-table, the same way snapshot_diff
(queries/versioning.py) answers it corpus-to-corpus. Payload plan; the
reference has no runtime drift report.

Everything is computed from the metrics tables the write-audit sink
emitted (plans/sink.py METRICS_SCHEMA) — the corpora themselves are never
re-read. Per-chunk rates are rebuilt from the RAW int64/double sums
(ppl_sum/ppl_n, n_keep/n_docs — the round-2 verdict's exact-rollup
columns), never by averaging pre-rounded partials, so a zero-change rerun
reports exactly zero drift. Both metrics tables are tiny (one row per
chunk × partition), so the whole report is driver-light: two scans of
small parquet, one join on chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _per_chunk(metrics: DataFrame, tag: str) -> DataFrame:
    return metrics.groupBy("chunk").agg(
        F.sum("n_docs").alias(f"n_docs_{tag}"),
        (F.sum("n_keep") / F.sum("n_docs")).alias(f"keep_rate_{tag}"),
        (F.sum("ppl_sum") / F.sum("ppl_n")).alias(f"avg_ppl_{tag}"),
        (F.sum("n_scrubbed") / F.sum("n_docs")).alias(f"scrub_rate_{tag}"),
    )


def metrics_drift(
    spark: SparkSession,
    metrics_dir_a: str,
    metrics_dir_b: str,
    keep_rate_tol: float = 0.01,
    ppl_tol: float = 1.0,
    scrub_rate_tol: float = 0.01,
) -> DataFrame:
    """Per-chunk drift between two runs' metrics dirs (run A = baseline,
    run B = candidate). Columns: chunk, n_docs_a/b, keep_rate_a/b,
    keep_rate_delta, avg_ppl_a/b, avg_ppl_delta, scrub_rate_a/b,
    scrub_rate_delta, flagged (any tracked delta beyond its tolerance).
    Full outer join: a chunk present in only one run is itself drift
    (null side, flagged)."""
    a = _per_chunk(spark.read.parquet(metrics_dir_a), "a")
    b = _per_chunk(spark.read.parquet(metrics_dir_b), "b")
    j = a.join(b, "chunk", "full_outer")
    keep_delta = F.col("keep_rate_b") - F.col("keep_rate_a")
    ppl_delta = F.col("avg_ppl_b") - F.col("avg_ppl_a")
    scrub_delta = F.col("scrub_rate_b") - F.col("scrub_rate_a")
    flagged = (
        F.col("keep_rate_a").isNull()
        | F.col("keep_rate_b").isNull()
        | (F.abs(keep_delta) > keep_rate_tol)
        | (F.abs(ppl_delta) > ppl_tol)
        | (F.abs(scrub_delta) > scrub_rate_tol)
    )
    return j.select(
        "chunk",
        "n_docs_a", "n_docs_b",
        "keep_rate_a", "keep_rate_b",
        keep_delta.alias("keep_rate_delta"),
        "avg_ppl_a", "avg_ppl_b",
        ppl_delta.alias("avg_ppl_delta"),
        "scrub_rate_a", "scrub_rate_b",
        scrub_delta.alias("scrub_rate_delta"),
        flagged.alias("flagged"),
    ).orderBy("chunk")
