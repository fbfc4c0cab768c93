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


def test_fetch_clears_stale_files_and_replays_metrics(spark, pages_sdf, tmp_path):
    """A fetched chunk must (a) purge part files left by a prior crashed
    compute attempt — they are not in the cache's file list and would
    otherwise duplicate rows — and (b) materialize metrics/lineage rows so
    a cache-hydrated out_dir honours the full artifact contract."""
    import os

    from isimip_qa_spark.plots import metrics_rollup

    cache = str(tmp_path / "cache")
    cfg = _cfg()
    run_qa(spark, pages_sdf, cfg, cache)
    cache_rollup = {
        r["chunk"]: (r["n_docs"], r["keep_rate"])
        for r in metrics_rollup(spark, cache).collect()
    }

    out = str(tmp_path / "out")
    # simulate a crashed compute attempt: a stray committed part file with
    # valid parquet bytes but no manifest
    stray_dir = f"{out}/data/chunk=0"
    os.makedirs(stray_dir)
    src = f"{cache}/data/chunk=1"
    stray_src = os.path.join(src, sorted(os.listdir(src))[0])
    with open(stray_src, "rb") as fsrc, open(
        os.path.join(stray_dir, "part-99999.parquet"), "wb"
    ) as fdst:
        fdst.write(fsrc.read())

    got = run_qa(spark, pages_sdf, cfg, out, cache_base=cache)
    assert got["chunks_fetched"] == [0, 1]
    assert "part-99999.parquet" not in os.listdir(stray_dir)  # purged
    want = read_scored(spark, cache).count()
    assert read_scored(spark, out).count() == want  # no duplicated rows

    # metrics replayed from the manifests: same rollup as the cache
    out_rollup = {
        r["chunk"]: (r["n_docs"], r["keep_rate"])
        for r in metrics_rollup(spark, out).collect()
    }
    assert out_rollup == cache_rollup
    assert os.path.isdir(f"{out}/lineage")


def test_fetch_rejects_traversal_file_names(spark, pages_sdf, tmp_path):
    """A malicious cache manifest must not direct writes outside the chunk
    directory (the cache may be an untrusted HTTP server)."""
    import json
    import os

    cache = str(tmp_path / "cache")
    cfg = _cfg()
    run_qa(spark, pages_sdf, cfg, cache)
    mpath = f"{cache}/_manifest/chunk_0.json"
    with open(mpath) as f:
        man = json.load(f)
    man["files"] = ["../../evil.parquet"]
    with open(mpath, "w") as f:
        json.dump(man, f)

    out = str(tmp_path / "out")
    got = run_qa(spark, pages_sdf, cfg, out, cache_base=cache)
    assert 0 not in got["chunks_fetched"]  # rejected, recomputed instead
    assert 0 in got["chunks_run"]
    assert not os.path.exists(str(tmp_path / "evil.parquet"))
