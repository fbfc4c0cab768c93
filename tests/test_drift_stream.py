"""Streaming vocabulary-drift monitor: per-file micro-batches scored
against a reference distribution built from the clean shard — the clean
batch reads zero OOV / zero drift, the alien batch reads high OOV, and
every number matches a pure-Python Counter reference of the same
formula."""

from __future__ import annotations

import math
import os
from collections import Counter

import pytest

from isimip_qa_spark.streaming.drift_stream import (
    batch_drift_metrics,
    build_ref_model,
    drift_stream,
)

CLEAN = ["the and of to", "the of in is", "and to in the"]  # 3 docs
ALIEN = ["zzz qqq www", "zzz the vvv"]  # 2 docs, mostly OOV vs CLEAN


def _q_half_away(x: float) -> float:
    from isimip_qa_spark.queries.datasheet import QD

    return math.copysign(math.floor(abs(x) * QD + 0.5), x) / QD


def _ref_metrics(texts: list[str], ref_texts: list[str]):
    ref = Counter(w for t in ref_texts for w in t.split(" "))
    rn = sum(ref.values())
    c = Counter(w for t in texts for w in t.split(" "))
    n = sum(c.values())
    oov = sum(cnt for w, cnt in c.items() if w not in ref)
    half = 0.0
    for w, cnt in c.items():
        p = cnt / n
        q = ref.get(w, 0) / rn
        # mirror the engine's per-token 1/QD dyadic quantization — the sum
        # of grid values is exact regardless of addition order
        half += _q_half_away(0.5 * p * math.log2(p / ((p + q) / 2)))
    return (len(texts), n, round(oov / n, 6), round(half, 6))


def _write(spark, path: str, texts: list[str], start_id: int) -> None:
    spark.createDataFrame(
        [(start_id + i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _write_shard(spark, src: str, name: str, texts: list[str], sid: int):
    """One parquet FILE directly inside `src` (the file stream source does
    not recurse into per-shard subdirectories)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    _write(spark, f"{tmp}/d", texts, sid)
    part = next(
        f for f in os.listdir(f"{tmp}/d") if f.endswith(".parquet")
    )
    os.makedirs(src, exist_ok=True)
    shutil.move(f"{tmp}/d/{part}", f"{src}/{name}.parquet")
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_matches_python_reference(spark, tmp_path):
    ref_dir = str(tmp_path / "ref")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write(spark, f"{ref_dir}/documents.parquet", CLEAN, 0)
    # two source FILES → two micro-batches (maxFilesPerTrigger=1)
    _write_shard(spark, src, "a", CLEAN, 0)
    _write_shard(spark, src, "b", ALIEN, 100)

    ref = build_ref_model(spark, ref_dir)
    q = drift_stream(spark, src, out, ref)
    assert q.awaitTermination(120), "stream did not finish in time"

    rows = spark.read.parquet(f"{out}/metrics").collect()
    got = {
        r["n_docs"]: (r["n_docs"], r["n_tokens"], r["oov_frac"], r["half_js"])
        for r in rows
    }
    assert got[3] == _ref_metrics(CLEAN, CLEAN)
    assert got[2] == _ref_metrics(ALIEN, CLEAN)
    # the clean batch IS the reference: zero OOV, zero drift
    assert got[3][2] == 0.0 and got[3][3] == 0.0
    # the alien batch: 5 of its 6 tokens are OOV (only "the" is known)
    assert got[2][2] == pytest.approx(5 / 6, abs=1e-6)
    assert got[2][3] > 0.3


def test_replayed_batch_does_not_duplicate_metrics(spark, tmp_path):
    """A restarted stream over the same source (fresh checkpoint → every
    batch replays) must leave exactly one metrics row per shard: the
    deterministic per-batch overwrite path makes the sink idempotent."""
    import shutil

    ref_dir = str(tmp_path / "ref")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write(spark, f"{ref_dir}/documents.parquet", CLEAN, 0)
    _write_shard(spark, src, "a", CLEAN, 0)
    ref = build_ref_model(spark, ref_dir)

    q = drift_stream(spark, src, out, ref)
    assert q.awaitTermination(120)
    shutil.rmtree(f"{out}/_chk")  # lose the offsets → full replay
    q = drift_stream(spark, src, out, ref)
    assert q.awaitTermination(120)

    rows = spark.read.parquet(f"{out}/metrics").collect()
    assert len(rows) == 1


def test_batch_helper_shares_the_stream_formula(spark, tmp_path):
    """batch_drift_metrics is the SAME function the sink calls — running
    it on a batch DataFrame must reproduce the stream's row exactly."""
    ref_dir = str(tmp_path / "ref")
    _write(spark, f"{ref_dir}/documents.parquet", CLEAN, 0)
    ref = build_ref_model(spark, ref_dir)
    batch = spark.createDataFrame(
        [(i, t, "en", "s", 1) for i, t in enumerate(ALIEN)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    m = batch_drift_metrics(batch, ref)
    want = _ref_metrics(ALIEN, CLEAN)
    assert (m["n_docs"], m["n_tokens"], m["oov_frac"], m["half_js"]) == want
