"""Streaming latest-capture-per-URL upsert (`streaming/url_latest_stream.py`):

- after each availableNow catch-up, the bucket-partitioned state table
  equals the BATCH `dedup_url_latest` over everything ingested so far;
- a second batch touching a subset of buckets leaves untouched bucket
  partitions byte-for-byte alone (same part-file listing);
- replaying an already-applied batch id is a no-op (idempotent merge).
"""

from __future__ import annotations

import os

import pytest

from isimip_qa_spark.queries.urlops import dedup_url_latest
from isimip_qa_spark.streaming.url_latest_stream import (
    merge_batch,
    url_latest_stream,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, ids):
    rows = [
        (i, f"text {i}", "en", f"src{i % 20}", len(f"text {i}"))
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _state_rows(spark, state_dir):
    df = spark.read.option("basePath", state_dir).parquet(
        *[
            os.path.join(state_dir, d)
            for d in os.listdir(state_dir)
            if d.startswith("bucket=")
        ]
    )
    return sorted(
        (r["canon_url"], r["doc_id"], r["capture"])
        for r in df.select("canon_url", "doc_id", "capture").collect()
    )


def _batch_rows(spark, src_dir):
    return sorted(
        (r["canon_url"], r["doc_id"], r["capture"])
        for r in dedup_url_latest(spark, src_dir).collect()
    )


def _listing(state_dir):
    out = {}
    for d in os.listdir(state_dir):
        if d.startswith("bucket="):
            p = os.path.join(state_dir, d)
            out[d] = sorted(
                (f, os.path.getsize(os.path.join(p, f)))
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
    return out


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    (src).mkdir()
    return str(src), str(tmp_path / "state")


def _run(spark, src, state):
    q = url_latest_stream(spark, f"{src}/documents.parquet", state)
    assert q.awaitTermination(120), "stream did not finish in time"


def test_stream_equals_batch_and_untouched_buckets_survive(spark, dirs):
    src, state = dirs
    _docs(spark, range(0, 400)).coalesce(1).write.mode("append").parquet(
        f"{src}/documents.parquet"
    )
    _run(spark, src, state)
    assert _state_rows(spark, state) == _batch_rows(spark, src)

    before = _listing(state)
    # second crawl batch: a narrow doc_id slice → touches FEW canon groups
    _docs(spark, range(400, 420)).coalesce(1).write.mode("append").parquet(
        f"{src}/documents.parquet"
    )
    _run(spark, src, state)
    assert _state_rows(spark, state) == _batch_rows(spark, src)

    after = _listing(state)
    untouched = [
        b for b in before if before[b] == after.get(b)
    ]
    # the 20-doc batch cannot have touched every one of the 16 buckets'
    # worth of state written by 400 docs — some partitions must be intact
    assert untouched, f"every bucket rewritten: {sorted(after)}"


def test_interrupted_swap_recovers_without_losing_rows(spark, dirs):
    """Crash between 'rename old bucket aside' and 'rename staged bucket
    in' must not lose the bucket's pre-existing rows: the next merge rolls
    the swap forward from the aside dir, and re-merging is idempotent."""
    src, state = dirs
    os.makedirs(state, exist_ok=True)
    _docs(spark, range(0, 400)).coalesce(1).write.mode("append").parquet(
        f"{src}/documents.parquet"
    )
    merge_batch(spark, _docs(spark, range(0, 400)), state, batch_id=0)

    # simulate the crash: batch 1's swap moved one populated bucket aside
    # and died before renaming the staged replacement in
    victim = next(
        d for d in sorted(os.listdir(state)) if d.startswith("bucket=")
    )
    aside = os.path.join(state, ".old-1")
    os.makedirs(aside)
    os.replace(os.path.join(state, victim), os.path.join(aside, victim))

    # replayed batch 1: recovery restores the bucket, then merges
    _docs(spark, range(400, 420)).coalesce(1).write.mode("append").parquet(
        f"{src}/documents.parquet"
    )
    merge_batch(spark, _docs(spark, range(400, 420)), state, batch_id=1)
    assert not os.path.isdir(aside)
    assert _state_rows(spark, state) == _batch_rows(spark, src)


def test_replayed_batch_is_noop(spark, dirs):
    src, state = dirs
    os.makedirs(state, exist_ok=True)
    batch = _docs(spark, range(0, 100))
    merge_batch(spark, batch, state, batch_id=0)
    rows0, listing0 = _state_rows(spark, state), _listing(state)
    # foreachBatch replay: same batch id delivered again after a "failure"
    merge_batch(spark, batch, state, batch_id=0)
    assert _state_rows(spark, state) == rows0
    assert _listing(state) == listing0
