"""The synthetic pages generator: determinism, schema, planted structure."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_spark_matches_pandas_bytes(spark, pages_pdf, pages_sdf):
    """Distributed generation == pure-pandas generation, byte for byte
    (the fixture analogue of the reference's analytically-known datasets)."""
    got = pages_sdf.toPandas().sort_values("url").reset_index(drop=True)
    want = pages_pdf.sort_values("url").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert got["text"].tolist() == want["text"].tolist()
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in want["html"]]
    assert got["url"].tolist() == want["url"].tolist()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["warc_ts"].tolist() == want["warc_ts"].tolist()


def test_planted_buckets(pages_pdf):
    ids = np.arange(2000)
    b = ids % 100
    n_words = pages_pdf["text"].str.split(" ").str.len().to_numpy()
    # too-short bucket
    assert (n_words[(b >= 70) & (b < 75)] < 50).all()
    # clean buckets are >= 50 words
    assert (n_words[b < 70] >= 50).all()
    # PII planted
    pii = pages_pdf.loc[(b >= 94) & (b <= 96), "text"]
    assert pii.str.contains("example-mail.com").all()
    # near-dup bucket 97 docs share almost all words with id-1
    for i in range(97, 2000, 100):
        a = set(pages_pdf["text"][i - 1].split())
        c = set(pages_pdf["text"][i].split())
        assert len(a & c) / len(a | c) > 0.8


def test_vectorized_generator_matches_reference_loop():
    """`_texts_vec` (the production generator) is byte-identical to the
    per-id reference `_text_for` across every bucket × language combination
    (ids 0..2999 cover all 100 buckets in all 5 language blocks × 2)."""
    from isimip_qa_spark.sources.pages import _text_for, _texts_vec

    ids = np.arange(3000)
    texts, langs = _texts_vec(ids)
    for i in ids:
        t_ref, l_ref = _text_for(int(i))
        assert texts[i] == t_ref, f"text mismatch at id {i} (bucket {i % 100})"
        assert langs[i] == l_ref, f"lang mismatch at id {i}"


def test_vectorized_generator_arbitrary_id_slices():
    """Row content is f(id) only: a shuffled, gappy id slice produces the
    same texts as the same ids inside a contiguous range."""
    from isimip_qa_spark.sources.pages import _texts_vec

    full_texts, full_langs = _texts_vec(np.arange(1000))
    sel = np.array([997, 3, 514, 96, 97, 98, 250])
    texts, langs = _texts_vec(sel)
    assert texts == [full_texts[i] for i in sel]
    assert langs == [full_langs[i] for i in sel]


def test_host_skew(pages_pdf):
    hosts = pages_pdf["url"].str.extract(r"https://(host\d+)")[0]
    frac0 = (hosts == "host0").mean()
    assert 0.19 < frac0 < 0.21  # 20 % hot host


def test_langs_cycle(pages_pdf):
    assert set(pages_pdf["lang"]) == {"en", "es", "fr", "de", "zh"}
