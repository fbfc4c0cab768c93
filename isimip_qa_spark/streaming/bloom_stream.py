"""Streaming exact-membership prefilter against an ingested history.

The batch twin (queries/bloom.py) builds an M-bit Bloom bitmap over the
history's content digests and probes it map-side. A continuously-arriving
crawl wants the SAME filter on the stream: `dropDuplicatesWithinWatermark`
(qa_stream.py) bounds duplicates *inside* the stream's watermark horizon,
but "have we ingested this page in any previous crawl?" needs history
state that streaming state stores cannot hold (the history is the whole
corpus). The Bloom bitmap is exactly the right artifact: built once
batch-side (bounded by M bits regardless of history size), shipped into
the streaming plan as a LITERAL, probed by pure column expressions — the
stream stays stateless, shuffle-free, and Python-free.

Sink discipline (matching decontaminate_stream): unseen pages append to
`{out}/unseen` (the ingest-worthy stream); bloom-positive rows append
(url, warc_ts, lang) audit rows to `{out}/seen` WITHOUT text — by the
Bloom contract they are "possibly seen" (no false negatives, FP rate set
by M/K sizing), and the downstream exact-verify join against the history
digest index runs batch-side over this small slice, never over the
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.bloom import bloom_hit_expr, digest_exprs
from .qa_stream import read_pages_stream


def _digest_cols(df: DataFrame) -> DataFrame:
    h1, h2 = digest_exprs()  # the batch query's digest, bit-for-bit
    return df.withColumn("h1", h1).withColumn("h2", h2)


def bloom_filter_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    bitmap_words: list[int],
):
    """Split the arriving page stream on Bloom membership in the history
    bitmap. Returns the StreamingQuery (availableNow trigger)."""
    pages = read_pages_stream(spark, src_dir).drop("html").filter(
        F.col("warc_ts").isNotNull()
    )
    flagged = _digest_cols(pages).withColumn(
        "bloom_hit", bloom_hit_expr(bitmap_words)
    )

    def write_batch(df: DataFrame, epoch: int) -> None:
        # NULL text => NULL digest => NULL bloom_hit: such rows cannot be
        # membership-decided, and both ~hit and hit filters would drop
        # them (a silent loss). Route them to unseen/ — ingest-worthy by
        # default, the same never-lose-rows discipline as the tolerant
        # reads.
        hit = F.coalesce(F.col("bloom_hit"), F.lit(False))
        df = df.persist()
        try:
            df.filter(~hit).drop(
                "bloom_hit", "h1", "h2"
            ).write.mode("append").parquet(f"{out_dir}/unseen")
            df.filter(hit).select(
                "url", "warc_ts", "lang"
            ).write.mode("append").parquet(f"{out_dir}/seen")
        finally:
            df.unpersist()

    return (
        flagged.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
