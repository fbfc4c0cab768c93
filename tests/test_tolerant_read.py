"""Corrupt-file tolerance: an ingest read over a dir containing a
truncated part file and a garbage file yields exactly the healthy files'
rows; the strict read fails; artifact reads stay strict by default."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from isimip_qa_spark.catalog import read_pages, read_pages_tolerant
from isimip_qa_spark.sources.pages import pages_pandas


def _stage(spark, tmp_path) -> tuple[str, int]:
    src = str(tmp_path / "pages")
    pdf = pages_pandas(np.arange(500))
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)
    parts = sorted(glob.glob(f"{src}/part-*.parquet"))
    assert len(parts) == 4
    # count rows of the two files we are about to destroy
    lost = spark.read.parquet(parts[0], parts[1]).count()
    # truncate one mid-file (simulates a writer killed between flushes)
    size = os.path.getsize(parts[0])
    with open(parts[0], "r+b") as f:
        f.truncate(size // 2)
    # overwrite another with garbage (bitrot / non-parquet junk)
    with open(parts[1], "wb") as f:
        f.write(b"not a parquet file at all" * 100)
    return src, 500 - lost


def test_tolerant_read_skips_corrupt_files(spark, tmp_path):
    src, healthy = _stage(spark, tmp_path)
    got = read_pages_tolerant(spark, src)
    assert got.count() == healthy  # bad files cost their rows, not the run
    assert set(got.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_strict_read_fails_on_corrupt_files(spark, tmp_path):
    src, _ = _stage(spark, tmp_path)
    with pytest.raises(Exception):
        read_pages(spark, src).count()
