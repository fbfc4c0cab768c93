"""Streaming vocabulary-drift monitor — the online face of
queries/datasheet.source_divergence.

A crawl ingest stream needs to notice when arriving pages stop looking
like the reference corpus (a new spam campaign, an encoding breakage, a
domain-mix shift) BEFORE the batch datasheet run. The standard conversion
of the batch JS-divergence: per micro-batch, compare the batch's unigram
distribution p against a broadcast reference distribution q and emit one
metrics row.

What is computable online: the full JS needs q's whole support per batch
(reference-vocab-sized work for every micro-batch). The monitored
quantity is therefore the p-side JS term — ½·KL(p ‖ (p+q)/2) summed over
the BATCH support (tokens with p=0 contribute nothing, so the sum never
touches reference-only vocabulary) — plus the OOV occurrence mass
(fraction of batch tokens absent from the reference vocabulary, which
lower-bounds the drift: each OOV token contributes exactly ½·p to the
half-JS since its mixture is p/2). Bounded in [0, ½], zero iff p == q on
the batch support.

Plan shape per batch: one batch-bounded token-count aggregate, one
broadcast join against the reference (w, q) table (reference vocab is
tens of MB at production scale — the LM-model broadcast discipline), one
single-row aggregate appended to `{out}/metrics`. Two driver-side
scalars per batch (token total, doc count) — bounded, never row data.
No streaming state: each batch is scored independently, so there is
nothing to checkpoint beyond the source offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import SCHEMAS, read_table
from ..functions import textstats as ts


def build_ref_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference unigram distribution (w, q) from the documents table —
    the batch-side 'trained' model the stream compares against. One
    corpus-scale exchange; the probability uses the exact integer total."""
    c = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(ts.tokens_expr(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = c.agg(F.sum("cnt")).collect()[0][0]
    return c.select(
        "w", (F.col("cnt").cast("double") / F.lit(float(total))).alias("q")
    )


def batch_drift_metrics(batch: DataFrame, ref: DataFrame) -> dict:
    """One metrics dict for a (micro-)batch: doc count, token count, OOV
    occurrence fraction, and the p-side JS term over the batch support.
    Shared by the stream sink and the batch parity test."""
    counts = (
        batch.select(F.explode(ts.tokens_expr(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_docs = batch.count()
    j = counts.join(F.broadcast(ref), "w", "left")
    n = j.agg(F.sum("cnt")).collect()[0][0]
    if not n:
        return {
            "n_docs": n_docs,
            "n_tokens": 0,
            "oov_frac": None,
            "half_js": None,
        }
    p = F.col("cnt").cast("double") / F.lit(float(n))
    m = (p + F.coalesce(F.col("q"), F.lit(0.0))) / 2
    row = j.agg(
        F.sum(F.when(F.col("q").isNull(), F.col("cnt")).otherwise(0)).alias(
            "oov"
        ),
        F.sum(0.5 * p * F.log2(p / m)).alias("half_js"),
    ).collect()[0]
    return {
        "n_docs": n_docs,
        "n_tokens": int(n),
        "oov_frac": round(row["oov"] / n, 6),
        "half_js": round(row["half_js"], 6),
    }


def drift_stream(
    spark: SparkSession, src_dir: str, out_dir: str, ref: DataFrame
):
    """Append one (batch_id, n_docs, n_tokens, oov_frac, half_js) row per
    micro-batch to `{out_dir}/metrics`. One file per trigger so each
    arriving shard gets its own drift reading. Returns the StreamingQuery
    (availableNow)."""
    stream = (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        m = batch_drift_metrics(batch, ref)
        spark.createDataFrame(
            [
                (
                    batch_id,
                    m["n_docs"],
                    m["n_tokens"],
                    m["oov_frac"],
                    m["half_js"],
                )
            ],
            "batch_id long, n_docs long, n_tokens long, "
            "oov_frac double, half_js double",
        ).coalesce(1).write.mode("append").parquet(f"{out_dir}/metrics")

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{out_dir}/_chk")
        .trigger(availableNow=True)
        .start()
    )
