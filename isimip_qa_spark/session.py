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


def get_spark(
    app_name: str = "isimip-qa-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with QA-workload defaults."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
        # 128 MiB splits: the sweet spot for wide parquet scans of page tables.
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.ui.enabled": os.environ.get("SPARK_UI", "false"),
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
