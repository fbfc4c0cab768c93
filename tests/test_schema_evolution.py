"""Schema evolution across crawl drops: the declared read schema is the
contract, files may lag or lead it.

- a drop written BEFORE a column existed (no `lang`) reads as null lang,
- a drop written AFTER new producer fields were added reads with the
  extras pruned (ReadSchema stays the declared five columns),
- a mixed directory of both vintages reads in one scan.

This is the file-level analogue of the reference's tolerant decode, and
the everyday reality of a 10^12-doc table fed by years of crawler
versions."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from isimip_qa_spark.catalog import read_pages
from isimip_qa_spark.sources.pages import pages_pandas


def test_old_new_and_mixed_vintages(spark, tmp_path):
    pdf = pages_pandas(np.arange(200))
    src = str(tmp_path / "pages")

    old = spark.createDataFrame(pdf.drop(columns=["lang"]))  # pre-lang era
    old.write.parquet(src)

    new = spark.createDataFrame(pdf).withColumn(
        "crawler_version", F.lit("v9")
    ).withColumn("fetch_ms", F.lit(123))
    new.write.mode("append").parquet(src)

    got = read_pages(spark, src)
    assert got.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert got.count() == 400
    # the old vintage's lang is null, the new one's is populated
    assert got.filter(F.col("lang").isNull()).count() == 200
    # extra producer columns never reach the plan (column pruning)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "crawler_version" not in plan and "fetch_ms" not in plan
