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
the batch support. Per-token terms are quantized to the 1/QD dyadic grid
before summation (the source_divergence / graph.py / lm.py discipline),
so the sum is partition-order-independent and matches a sequential
reference exactly.

Plan shape per batch: ONE tokenization of the batch (the counts frame is
persisted across its two consumers), one broadcast join against the
reference (w, q) table — materialized ONCE at build time as a local
relation (the LM-model broadcast discipline: vocab-sized, tens of MB at
production scale), never recomputed per batch — and a single-row write
to a DETERMINISTIC per-batch path (`metrics/batch=<id>`, mode
overwrite), so a foreachBatch REPLAY after a crash lands on the same
path instead of appending a duplicate row — idempotency by construction,
no marker file needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import SCHEMAS, read_table
from ..queries.datasheet import QD, token_counts


def build_ref_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference unigram distribution (w, q) from the documents table —
    the batch-side 'trained' model the stream compares against. The
    counts are computed once and materialized as a LOCAL relation
    (vocab-sized), so per-batch joins never re-run the corpus scan."""
    c = token_counts(read_table(spark, sf_dir, "documents"))
    rows = c.collect()
    total = float(sum(r["cnt"] for r in rows))
    data = [(r["w"], r["cnt"] / total) for r in rows] if total else []
    return spark.createDataFrame(data, "w string, q double")


def batch_drift_metrics(batch: DataFrame, ref: DataFrame) -> dict:
    """One metrics dict for a (micro-)batch: doc count, token count, OOV
    occurrence fraction, and the p-side JS term over the batch support.
    Shared by the stream sink and the batch parity test."""
    counts = token_counts(batch).persist()
    try:
        n_docs = batch.count()
        n = counts.agg(F.sum("cnt")).collect()[0][0]
        if not n:
            return {
                "n_docs": n_docs,
                "n_tokens": 0,
                "oov_frac": None,
                "half_js": None,
            }
        p = F.col("cnt").cast("double") / F.lit(float(n))
        m = (p + F.coalesce(F.col("q"), F.lit(0.0))) / 2
        # dyadic-quantized per-token term → partition-order-independent sum
        t = F.round(0.5 * p * F.log2(p / m) * QD) / QD
        row = (
            counts.join(F.broadcast(ref), "w", "left")
            .agg(
                F.sum(
                    F.when(F.col("q").isNull(), F.col("cnt")).otherwise(0)
                ).alias("oov"),
                F.sum(t).alias("half_js"),
            )
            .collect()[0]
        )
        return {
            "n_docs": n_docs,
            "n_tokens": int(n),
            "oov_frac": round(row["oov"] / n, 6),
            "half_js": round(row["half_js"], 6),
        }
    finally:
        counts.unpersist()


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
        # deterministic per-batch path + overwrite: a replayed batch
        # rewrites its own row instead of appending a duplicate
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
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/metrics/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{out_dir}/_chk")
        .trigger(availableNow=True)
        .start()
    )
