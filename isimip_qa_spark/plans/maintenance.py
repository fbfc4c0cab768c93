"""Table maintenance: small-file compaction (the OPTIMIZE half of an
Iceberg-shaped table's lifecycle).

A checkpointed, per-chunk, resumable writer (plans/checkpoint.py,
plans/sink.py) necessarily produces many small part files — every chunk ×
partition writes its own. At 100 TB the small-file problem is a primary
operational cost: each file is a scan task, a NameNode/manifest entry, and
an open() round trip. The reference's analogue is its artifact store of
many small per-extraction CSVs consolidated by second-stage rollups
(isimip_qa/extractions + assessments reading them back); here the
consolidation is physical.

Design — ZERO-shuffle compaction:

- Only files smaller than `small_bytes` are rewritten; files already at
  target size are untouched (their bytes never move). Selection is
  driver-side file metadata only.
- The rewrite reads JUST the small files with
  `spark.sql.files.maxPartitionBytes = target_bytes` and
  `spark.sql.files.openCostInBytes` high enough that Spark's split
  packing coalesces many small files into each scan task; each task's
  rows are written back as ONE output file. No repartition(), no
  exchange — the plan is scan → write (asserted in tests). Parallelism =
  ceil(small_bytes_total / target_bytes) tasks, exactly the output file
  count.
- Crash safety: new files are written under a `_`-prefixed staging dir
  (invisible to Spark/Hadoop readers while being written) and moved into
  the table dir before the originals are deleted. A crash
  between move and delete leaves duplicate rows VISIBLE — this
  path-level compactor is for plain parquet dirs; the transactional
  answer is the DataFrameWriterV2/Iceberg sink (catalog.py) where
  compaction commits as a snapshot and readers never see the interim
  state. Documented, not hidden.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionStats:
    n_files_before: int
    n_files_after: int
    n_rewritten: int
    n_untouched: int
    bytes_rewritten: int


def _data_files(path: str) -> list[tuple[str, int]]:
    out = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if name.endswith(".parquet") and os.path.isfile(full):
            out.append((full, os.path.getsize(full)))
    return out


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    small_bytes: int | None = None,
) -> CompactionStats:
    """Rewrite small parquet files in `path` into ~target_bytes files.

    Files >= small_bytes (default target/2) keep their bytes in place.
    Returns stats; a no-op when nothing qualifies (0 or 1 small file)."""
    if small_bytes is None:
        small_bytes = target_bytes // 2
    files = _data_files(path)
    small = [(f, s) for f, s in files if s < small_bytes]
    if len(small) <= 1:
        return CompactionStats(len(files), len(files), 0, len(files), 0)

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    }
    staging = os.path.join(path, f"_compact_tmp_{uuid.uuid4().hex[:8]}")
    try:
        conf.set("spark.sql.files.maxPartitionBytes", str(target_bytes))
        # packing admits files while sum(size + openCost) <= target, so
        # openCost must be a small fraction of the target or nothing packs
        conf.set("spark.sql.files.openCostInBytes", str(max(1, target_bytes // 1024)))
        df = spark.read.parquet(*[f for f, _ in small])
        df.write.parquet(staging, mode="overwrite")
    except BaseException:
        # a failed rewrite must not leak a half-written staging dir into
        # the very table compaction was run to slim down
        shutil.rmtree(staging, ignore_errors=True)
        raise
    finally:
        for k, v in saved.items():
            conf.set(k, v)

    new_names = []
    n = 0
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            # no leading "_": Hadoop readers skip _/.-prefixed files
            dest = os.path.join(path, f"compacted-{uuid.uuid4().hex[:8]}-{n}.parquet")
            os.replace(os.path.join(staging, name), dest)
            new_names.append(dest)
            n += 1
    shutil.rmtree(staging, ignore_errors=True)
    for f, _ in small:
        os.remove(f)

    after = _data_files(path)
    return CompactionStats(
        n_files_before=len(files),
        n_files_after=len(after),
        n_rewritten=len(small),
        n_untouched=len(files) - len(small),
        bytes_rewritten=sum(s for _, s in small),
    )
