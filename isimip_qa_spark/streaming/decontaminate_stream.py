"""Streaming benchmark decontamination.

The batch twin (queries/decontaminate.py) broadcasts the benchmark's
distinct 13-gram set and joins; its docstring names the production variant
— 8-byte gram hashes instead of strings. A stream cannot take the join
route for the per-document verdict (the doc-level "any gram hit" decision
after an explode would need a streaming re-aggregation plus a
stream-stream join back to the page rows), so this module does what a
production crawl filter does:

1. `eval_gram_hashes` distills the benchmark side ONCE, batch-side, into a
   sorted int64 array of gram hashes (functions/grams.py kernel, computed
   distributed via mapInPandas, collected small — benchmarks are MBs).
2. `decontaminate_stream` broadcasts that array to every executor and
   scores arriving pages with a stateless vectorized mapInPandas: per-doc
   distinct-gram hit counts via searchsorted inside the Arrow batch. No
   shuffle, no streaming state, no per-row Python — scoring scales with
   input partitions exactly like the QA scoring stream.
3. The foreachBatch sink splits each micro-batch into `clean/` (zero hits,
   the training-ready stream) and `flagged/` (url, warc_ts, lang, n_hits —
   the audit trail; flagged rows keep no text, matching the metrics-only
   discipline of plans/sink.py).

Verdict parity with the batch string-join query holds up to 64-bit
gram-hash collisions (tests/test_streaming_decontaminate.py asserts exact
agreement with an independent pandas string-gram oracle on the planted
corpus; the duplicate structure of sources/pages.py guarantees real
cross-split contamination).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.grams import gram_hash_pairs, hit_counts
from .qa_stream import read_pages_stream

K = 13  # decontamination n-gram width (GPT-3 appendix C), batch twin's K


def eval_gram_hashes(eval_texts: DataFrame, k: int = K) -> np.ndarray:
    """Distill a benchmark table (any DataFrame with a `text` column) to
    its sorted distinct gram-hash array. Hashing runs distributed; only
    8-byte hashes cross to the driver, pre-deduped per partition."""

    def distill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _, gh = gram_hash_pairs(pdf["text"], k)
            yield pd.DataFrame({"gh": np.unique(gh)})

    rows = (
        eval_texts.select("text")
        .mapInPandas(distill, schema="gh long")
        .distinct()
        .collect()
    )
    return np.sort(np.array([r.gh for r in rows], dtype=np.int64))


def decontaminate_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    eval_hashes: np.ndarray,
    k: int = K,
):
    """Score arriving pages against the broadcast benchmark gram set;
    append clean pages to `{out_dir}/clean` and the contaminated audit rows
    to `{out_dir}/flagged`. Returns the StreamingQuery."""
    eval_hashes = np.sort(np.asarray(eval_hashes, dtype=np.int64))
    bcast = spark.sparkContext.broadcast(eval_hashes)

    pages = read_pages_stream(spark, src_dir).drop("html").filter(
        F.col("warc_ts").isNotNull()
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields
    ) + ", n_eval_hits long"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ev = bcast.value
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_eval_hits"] = hit_counts(pdf["text"], ev, k)
            yield pdf

    scored = pages.mapInPandas(score, schema=out_schema)

    def write_batch(df: DataFrame, epoch: int) -> None:
        df = df.persist()
        try:
            df.filter(F.col("n_eval_hits") == 0).drop("n_eval_hits").write.mode(
                "append"
            ).parquet(f"{out_dir}/clean")
            df.filter(F.col("n_eval_hits") > 0).select(
                "url", "warc_ts", "lang", "n_eval_hits"
            ).write.mode("append").parquet(f"{out_dir}/flagged")
        finally:
            df.unpersist()

    return (
        scored.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
