"""Shared-cache artifact fetch: a completed chunk in another run's output
(or behind a URL) is fetched instead of recomputed — the reference's
remote-fetch skip (/root/reference/isimip_qa/mixins/extractions.py:16-28,
gated at main.py:127)."""

from __future__ import annotations

from isimip_qa_spark.plans import QAConfig, run_qa
from isimip_qa_spark.plans.pipeline import read_scored


def _cfg(**kw):
    kw.setdefault("n_chunks", 2)
    kw.setdefault("n_partitions", 4)
    kw.setdefault("checkpoint_mode", "chunked")
    return QAConfig(**kw)


def test_fetch_from_path_url_and_hash_guard(spark, pages_sdf, tmp_path):
    cache = str(tmp_path / "cache")
    cfg = _cfg()
    first = run_qa(spark, pages_sdf, cfg, cache)
    assert first["chunks_run"] == [0, 1]
    want = read_scored(spark, cache).orderBy("url").toPandas()

    # 1) plain-path cache: everything fetched, nothing computed
    out_b = str(tmp_path / "b")
    got = run_qa(spark, pages_sdf, cfg, out_b, cache_base=cache)
    assert got["chunks_fetched"] == [0, 1]
    assert got["chunks_run"] == []
    have = read_scored(spark, out_b).orderBy("url").toPandas()
    assert have["url"].tolist() == want["url"].tolist()
    assert have["keep"].tolist() == want["keep"].tolist()
    assert have["text_scrubbed"].tolist() == want["text_scrubbed"].tolist()

    # 2) URL cache (urllib path; http(s) uses the identical code)
    out_c = str(tmp_path / "c")
    got = run_qa(spark, pages_sdf, cfg, out_c, cache_base=f"file://{cache}")
    assert got["chunks_fetched"] == [0, 1]

    # fetched chunks count as completed for later resumes
    again = run_qa(spark, pages_sdf, cfg, out_c, cache_base=f"file://{cache}")
    assert again["chunks_fetched"] == [] and again["chunks_run"] == []

    # 3) identity guard: different thresholds → different config hash →
    # cache ignored, chunks recomputed
    out_d = str(tmp_path / "d")
    other = _cfg(min_words=10)
    got = run_qa(spark, pages_sdf, other, out_d, cache_base=cache)
    assert got["chunks_fetched"] == []
    assert got["chunks_run"] == [0, 1]


def test_fetch_partial_cache(spark, pages_sdf, tmp_path):
    """A cache holding only chunk 0 yields one fetch + one compute."""
    import shutil

    cache = str(tmp_path / "cache")
    cfg = _cfg()
    run_qa(spark, pages_sdf, cfg, cache)
    # drop chunk 1 from the cache (manifest AND data)
    import os

    os.remove(f"{cache}/_manifest/chunk_1.json")
    shutil.rmtree(f"{cache}/data/chunk=1")

    out = str(tmp_path / "out")
    got = run_qa(spark, pages_sdf, cfg, out, cache_base=cache)
    assert got["chunks_fetched"] == [0]
    assert got["chunks_run"] == [1]
