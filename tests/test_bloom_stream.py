"""Streaming Bloom prefilter: the stream's unseen/seen split must agree
exactly with an independent Python md5/double-hash model of the same
bitmap, with zero false negatives on planted re-crawls, and the streaming
plan must stay stateless (no state store dirs in the checkpoint)."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from isimip_qa_spark.queries.bloom import (
    M_BITS,
    N_HASH,
    build_bitmap,
    _digests as digest_frame,
)
from isimip_qa_spark.sources.pages import pages_pandas


def _digests(text: str) -> tuple[int, int]:
    h = hashlib.md5(text.encode()).hexdigest()
    return int(h[0:15], 16), int(h[16:31], 16)


def _py_hit(bits: set[int], text: str) -> bool:
    h1, h2 = _digests(text)
    return all((h1 + i * h2) % M_BITS in bits for i in range(N_HASH))


def test_bloom_filter_stream_split(spark, tmp_path):
    from isimip_qa_spark.streaming.bloom_stream import bloom_filter_stream

    hist_pdf = pages_pandas(np.arange(0, 400))
    arriving = pages_pandas(np.arange(400, 800)).copy()
    # plant 20 exact re-crawls of history texts in the arriving stream
    arriving.loc[arriving.index[:20], "text"] = hist_pdf["text"].iloc[
        :20
    ].to_numpy()

    hist_sdf = spark.createDataFrame(hist_pdf[["text"]]).withColumn(
        "doc_id", F.lit(0)
    )
    words = build_bitmap(digest_frame(hist_sdf))

    # one NULL-text row: undecidable membership must route to unseen/,
    # never silently vanish from both sinks
    arriving = pd.concat(
        [arriving, arriving.iloc[[0]].assign(url="null://x", text=None)],
        ignore_index=True,
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(arriving).coalesce(2).write.parquet(src)
    out = str(tmp_path / "out")
    q = bloom_filter_stream(spark, src, out, words)
    q.awaitTermination(120)

    unseen = (
        spark.read.parquet(f"{out}/unseen").select("url", "text").toPandas()
    )
    seen_dir = f"{out}/seen"
    seen = (
        spark.read.parquet(seen_dir).toPandas()
        if os.path.exists(seen_dir)
        else pd.DataFrame({"url": []})
    )
    assert len(unseen) + len(seen) == len(arriving)

    bits = set()
    for t in hist_pdf["text"]:
        h1, h2 = _digests(t)
        bits.update((h1 + i * h2) % M_BITS for i in range(N_HASH))

    by_url = dict(zip(arriving["url"], arriving["text"]))
    # every planted re-crawl must be in seen/ (no false negatives)
    planted_urls = set(arriving["url"].iloc[:20])
    assert planted_urls <= set(seen["url"])
    # the undecidable NULL-text row landed in unseen/, not nowhere
    assert "null://x" in set(unseen["url"])
    # and the split equals the Python model exactly
    for url in unseen["url"]:
        assert by_url[url] is None or not _py_hit(bits, by_url[url])
    for url in seen["url"]:
        assert _py_hit(bits, by_url[url])
    # audit rows carry no text
    assert "text" not in seen.columns

    # stateless contract: no state store under the checkpoint
    ck = f"{out}/_checkpoint"
    assert os.path.isdir(ck)
    assert not os.path.isdir(os.path.join(ck, "state"))
