"""SparkSession factory tuned for the QA workload.

Scale rationale (100 TB target, tested on local[N]):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting stand in
  for hand-tuning at every scale factor.
- Arrow on, small record batches: `text`/`html` columns are large; a 10k-row
  Arrow batch of 5 KiB docs is ~50 MiB per Python worker — cap it.
- Session timezone UTC: parity with naive parquet timestamps read by the
  DuckDB oracle.
- `parquet.filterPushdown`/column pruning are on by default; we keep explicit
  selects everywhere so `html:binary` is never scanned by text-only stages
  (reference analogue: single-variable projection,
  /root/reference/isimip_qa/extractions/histogram.py:32).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# glibc malloc tuning for the executor Python workers: the QA kernels
# allocate/free multi-MB string buffers per Arrow batch; with the default
# dynamic mmap threshold every one is an mmap/munmap pair, and the resulting
# TLB shootdowns serialize ACROSS worker processes in the kernel (measured
# on this sandbox: ~1.8× worker throughput from this alone, and most of the
# lost 2→8-core scaling). Raising the thresholds keeps big buffers on the
# reusable heap free-list.
MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "536870912",
    "MALLOC_TRIM_THRESHOLD_": "536870912",
}


def get_spark(
    app_name: str = "isimip-qa-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with QA-workload defaults."""
    # local mode: python workers inherit the JVM's env, which inherits ours
    # (must be set before the JVM launches; harmless if it already did)
    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # keep parallelismFirst effective on SMALL inputs: the default 1 MiB
        # minPartitionSize floor coalesces a few-MB post-agg stage to ~3
        # partitions, serialising every downstream compute-heavy expression
        # (measured: 5× on the shingle explode after a groupBy). 64 KiB keeps
        # defaultParallelism partitions at bench scale; at 100-TB scale the
        # 64 MiB advisory size dominates and behavior is unchanged.
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # experiment hook: Arrow batch rows trade per-batch overhead against
        # kernel working-set size (cache pressure at high core counts)
        "spark.sql.execution.arrow.maxRecordsPerBatch": os.environ.get(
            "SPARK_GRAFT_ARROW_BATCH", "4096"
        ),
        # 128 MiB splits: the sweet spot for wide parquet scans of page tables.
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.ui.enabled": os.environ.get("SPARK_UI", "false"),
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g"),
    }
    # experiment hook: JVM flags for the (local-mode) driver+executor JVM,
    # e.g. GC selection — SPARK_GRAFT_JAVA_OPTS="-XX:+UseParallelGC"
    if os.environ.get("SPARK_GRAFT_JAVA_OPTS"):
        conf["spark.driver.extraJavaOptions"] = os.environ["SPARK_GRAFT_JAVA_OPTS"]
    # cluster mode: same malloc tuning for executor-side python workers
    for k, v in MALLOC_ENV.items():
        conf[f"spark.executorEnv.{k}"] = v
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
