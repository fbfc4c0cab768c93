"""Streaming DSIR scorer: bit-exact parity with the batch kernel, correct
threshold split, NULL-text routing, and the stateless-plan contract."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from isimip_qa_spark.queries.dsir import B, _score_kernel
from isimip_qa_spark.sources.pages import pages_pandas


@pytest.fixture(scope="module")
def model():
    """A fixed dyadic model (deterministic, no fit needed): bucket b gets
    logratio ((b * 7) % 33 - 16) / 1024 — same grid as the real fit."""
    return ((np.arange(B, dtype=np.int64) * 7) % 33 - 16) / 1024.0


def test_stream_split_matches_batch_kernel(spark, tmp_path, model):
    from isimip_qa_spark.streaming.dsir_stream import dsir_score_stream

    arriving = pages_pandas(np.arange(300)).copy()
    arriving = pd.concat(
        [arriving, arriving.iloc[[0]].assign(url="null://x", text=None)],
        ignore_index=True,
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(arriving).coalesce(2).write.parquet(src)
    out = str(tmp_path / "out")

    # threshold = the batch kernel's median weight over the same pages
    ref = _score_kernel(model)(arriving["text"].fillna(""))
    threshold = float(np.median(ref["logweight"][:-1]))

    q = dsir_score_stream(spark, src, out, model, threshold)
    q.awaitTermination(120)

    scored = spark.read.parquet(f"{out}/scored").toPandas()
    accepted = spark.read.parquet(f"{out}/accepted").toPandas()
    assert len(scored) == len(arriving)
    assert "text" not in scored.columns  # audit rows carry no text

    # bit-exact parity with the batch kernel per url
    ref_by_url = dict(zip(arriving["url"], ref["logweight"]))
    for _, r in scored.iterrows():
        if r["url"] == "null://x":
            assert pd.isna(r["logweight"])  # undecidable, never silently ok
        else:
            assert r["logweight"] == ref_by_url[r["url"]], r["url"]

    # the accepted split is exactly the >= threshold set (NULL rejected)
    expect = {
        u
        for u, lw in ref_by_url.items()
        if u != "null://x" and lw >= threshold
    }
    assert set(accepted["url"]) == expect
    assert "null://x" not in set(accepted["url"])

    # stateless contract: no state store under the checkpoint
    ck = f"{out}/_checkpoint"
    assert os.path.isdir(ck)
    assert not os.path.isdir(os.path.join(ck, "state"))
