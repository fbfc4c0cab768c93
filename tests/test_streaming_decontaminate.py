"""Streaming decontamination: broadcast gram-hash membership vs an
independent pandas STRING-gram oracle (no shared code with the kernel)."""

from __future__ import annotations

import numpy as np
import pytest

from isimip_qa_spark.functions.grams import gram_hash_pairs
from isimip_qa_spark.sources.pages import pages_pandas

K = 13


def string_grams(text: str, k: int = K) -> set[str]:
    """Independent oracle: distinct word k-grams with the clamped tail
    window (a doc with < k tokens yields one gram over all its tokens)."""
    toks = text.split(" ")
    w = max(len(toks) - k, 0) + 1
    return {" ".join(toks[i : i + k]) for i in range(w)}


def test_gram_hash_pairs_match_string_gram_counts():
    """Per-doc distinct hash count == distinct string-gram count (64-bit
    collisions would show as a deficit), incl. clamped and empty docs."""
    import pandas as pd

    pdf = pages_pandas(np.arange(50))
    texts = pd.concat(
        [pdf["text"], pd.Series(["", "one", "a b c", "a b c a b c"])],
        ignore_index=True,
    )
    gd, gh = gram_hash_pairs(texts, K)
    counts = np.bincount(gd, minlength=len(texts))
    for i, t in enumerate(texts):
        assert counts[i] == len(string_grams(t, K)), i
    # distinctness within doc is real
    assert len(set(zip(gd.tolist(), gh.tolist()))) == len(gd)


def test_eval_hashes_cross_side_consistency(spark):
    """Hashes distilled via the distributed mapInPandas path equal the
    driver-side kernel's (same kernel, but the Arrow/collect round-trip and
    int64 view must not perturb values)."""
    from isimip_qa_spark.streaming.decontaminate_stream import eval_gram_hashes

    pdf = pages_pandas(np.arange(0, 200))
    ev_pdf = pdf[np.arange(200) % 100 == 96]
    sdf = spark.createDataFrame(ev_pdf[["text"]])
    got = eval_gram_hashes(sdf, k=K)
    _, gh = gram_hash_pairs(ev_pdf["text"].reset_index(drop=True), K)
    want = np.sort(np.unique(gh))
    assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def staged_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("decon_src"))
    for lo, hi in [(0, 1000), (1000, 2000)]:
        pdf = pages_pandas(np.arange(lo, hi))
        spark.createDataFrame(pdf).coalesce(2).write.mode("append").parquet(src)
    return src


def test_decontaminate_stream_matches_string_oracle(
    spark, staged_src, tmp_path
):
    from isimip_qa_spark.streaming.decontaminate_stream import (
        decontaminate_stream,
        eval_gram_hashes,
    )

    pdf = pages_pandas(np.arange(2000))
    ids = np.arange(2000)
    ev_mask = ids % 100 == 96  # their exact dups live at id % 100 == 97
    ev_texts = pdf.loc[ev_mask, "text"]

    ev_sdf = spark.createDataFrame(pdf.loc[ev_mask, ["text"]])
    ev_hashes = eval_gram_hashes(ev_sdf, k=K)

    out = str(tmp_path / "decon_out")
    q = decontaminate_stream(spark, staged_src, out, ev_hashes, k=K)
    q.awaitTermination(120)

    # independent expected verdicts: distinct-gram intersection counts
    ev_grams: set[str] = set()
    for t in ev_texts:
        ev_grams |= string_grams(t, K)
    expected = {
        row.url: len(string_grams(row.text, K) & ev_grams)
        for row in pdf.itertuples()
    }
    n_contaminated = sum(1 for v in expected.values() if v > 0)
    # planted structure: every eval doc flags itself, every %100==97 dup of
    # an eval doc flags too → contamination really crosses the split
    assert n_contaminated >= 2 * ev_mask.sum()

    flagged = spark.read.parquet(f"{out}/flagged").toPandas()
    clean = spark.read.parquet(f"{out}/clean").toPandas()
    assert len(flagged) + len(clean) == 2000
    assert set(flagged["url"]) == {u for u, v in expected.items() if v > 0}
    got_hits = dict(zip(flagged["url"], flagged["n_eval_hits"]))
    assert got_hits == {u: v for u, v in expected.items() if v > 0}
    # clean rows keep the full page payload; flagged rows carry no text
    assert "text" in clean.columns and "text" not in flagged.columns
