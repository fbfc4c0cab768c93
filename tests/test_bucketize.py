"""Auto-bucketize for chunked mode (VERDICT r2 #5): non-pre-bucketed input
is staged ONCE into a bucket-partitioned layout, so chunk jobs prune to
their own bucket directory instead of re-scanning the corpus per chunk."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from isimip_qa_spark.plans import QAConfig, run_qa


def _totals(spark, out_dir):
    return (
        spark.read.parquet(f"{out_dir}/metrics")
        .agg(F.sum("n_docs").alias("d"), F.sum("n_keep").alias("k"))
        .collect()[0]
    )


def test_chunked_run_stages_bucketized_layout(spark, pages_sdf, tmp_path):
    out = str(tmp_path / "qa")
    cfg = QAConfig(n_chunks=4, n_partitions=4, checkpoint_mode="chunked")
    s = run_qa(spark, pages_sdf, cfg, out)
    assert s["chunks_run"] == [0, 1, 2, 3]

    staging = os.path.join(out, "_staging_bucket4")
    assert os.path.exists(os.path.join(staging, "_SUCCESS"))
    buckets = sorted(n for n in os.listdir(staging) if n.startswith("bucket="))
    assert buckets == [f"bucket={i}" for i in range(4)]

    # the chunk filter hits the PARTITION column of the staging layout —
    # directory-level pruning, so each chunk job's scan reads ~1/n_chunks
    # of the corpus (total input across chunk jobs ≈ 1× corpus, the point)
    staged = spark.read.parquet(staging)
    plan = staged.filter(F.col("bucket") == 2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:120]
    pruned = staged.filter(F.col("bucket") == 2).count()
    direct = spark.read.parquet(os.path.join(staging, "bucket=2")).count()
    assert pruned == direct

    # identical output totals to the one-job single_pass path
    solo = str(tmp_path / "solo")
    run_qa(spark, pages_sdf, QAConfig(n_chunks=4, n_partitions=4,
                                      checkpoint_mode="single_pass"), solo)
    a, b = _totals(spark, out), _totals(spark, solo)
    assert (a["d"], a["k"]) == (b["d"], b["k"])


def test_pre_bucketed_input_skips_staging(spark, pages_sdf, tmp_path):
    out = str(tmp_path / "qa_pre")
    cfg = QAConfig(n_chunks=2, n_partitions=4, checkpoint_mode="chunked")
    pre = pages_sdf.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(cfg.n_chunks))
    )
    s = run_qa(spark, pre, cfg, out)
    assert s["chunks_run"] == [0, 1]
    assert not any(n.startswith("_staging_bucket") for n in os.listdir(out))
