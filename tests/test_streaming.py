"""Structured Streaming QA: micro-batch scoring, watermarked windows,
custom stateful operator (state across batches)."""

from __future__ import annotations

import numpy as np
import pytest

from isimip_qa_spark.plans.config import QAConfig
from isimip_qa_spark.sources.pages import pages_pandas


@pytest.fixture(scope="module")
def staged_src(spark, tmp_path_factory):
    """Pages arriving as two file batches (ids 0-999, then 1000-1999)."""
    src = str(tmp_path_factory.mktemp("stream_src"))
    for lo, hi in [(0, 1000), (1000, 2000)]:
        pdf = pages_pandas(np.arange(lo, hi))
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(2).write.mode("append").parquet(src)
    return src


def test_score_stream_matches_batch(spark, staged_src, tmp_path, pages_sdf):
    from isimip_qa_spark.plans.pipeline import apply_stages
    from isimip_qa_spark.streaming.qa_stream import score_stream

    out = str(tmp_path / "stream_out")
    q = score_stream(spark, staged_src, out, QAConfig())
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/data").toPandas().sort_values("url")
    want = (
        apply_stages(pages_sdf, QAConfig())
        .toPandas()
        .sort_values("url")
    )
    assert len(got) == 2000
    assert got["keep"].tolist() == want["keep"].tolist()
    assert got["text_scrubbed"].tolist() == want["text_scrubbed"].tolist()


def test_windowed_metrics_append_mode(spark, staged_src, tmp_path):
    """Watermarked tumbling windows finalize once the watermark passes: all
    but the stream-final day window must be emitted."""
    from isimip_qa_spark.streaming.qa_stream import windowed_metrics_stream

    out = str(tmp_path / "wm_out")
    q = windowed_metrics_stream(spark, staged_src, out, QAConfig(), watermark="1 hour")
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/metrics").toPandas()
    # corpus spans 30 days; append mode withholds windows newer than
    # watermark = max_ts - 1h → at least the first 28 day-windows × langs
    assert got["window_start"].nunique() >= 28
    assert set(got["lang"]) == {"en", "es", "fr", "de", "zh"}
    assert (got["n_keep"] <= got["n_docs"]).all()


def test_host_state_across_batches(spark, staged_src, tmp_path):
    """applyInPandasWithState: totals accumulate across micro-batches."""
    from isimip_qa_spark.streaming.qa_stream import host_state_stream

    out = str(tmp_path / "state_out")
    q = host_state_stream(spark, staged_src, out)
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/host_state").toPandas()
    # host0 holds 20 % of 2000 docs; the final update row must show the
    # cumulative count over all batches
    final_host0 = got[got["host"] == "host0.example.org"]["n_docs"].max()
    assert final_host0 == 400
    assert got["first_ts"].min().year == 2024


def test_dedup_stream_first_arrival_wins(spark, staged_src, tmp_path):
    """Streaming exact dedup keeps one row per distinct text across
    micro-batches; the planted near-dup structure guarantees true
    duplicate groups exist in the corpus."""
    from isimip_qa_spark.streaming.qa_stream import dedup_stream

    out = str(tmp_path / "dedup_out")
    q = dedup_stream(spark, staged_src, out)
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/deduped").toPandas()
    pdf = pages_pandas(np.arange(2000))
    n_distinct = pdf["text"].nunique()
    assert n_distinct < 2000  # the corpus really contains duplicates
    assert len(got) == n_distinct
    assert got["text"].nunique() == n_distinct
