"""Streaming latest-capture-per-URL upsert: the streaming twin of batch
`queries/urlops.py:dedup_url_latest`, maintained incrementally as crawl
batches arrive.

A recrawl stream continuously revisits known URLs; the "latest capture
wins" table must be UPSERTED per microbatch, not recomputed. Streaming
state stores can't hold it (the key set is the whole URL universe), so the
correct Spark shape is `foreachBatch` + an idempotent MERGE into a
bucket-partitioned table:

1. Reduce the arriving microbatch to one winner per canonical URL
   (max capture, min doc_id tie-break — the batch twin's exact ordering,
   via the SHARED `urlops.capture_rows` projection) with a hash
   aggregation on a struct max: no window, no sort.
2. Bucket = pmod(xxhash64(canon_url), N_BUCKETS). The batch's winners touch
   a bounded set of buckets; ONLY those bucket partitions of the state
   table are read (partition-pruned scan), merged, re-reduced, and
   rewritten. Untouched buckets are never read or written, so per-batch
   merge cost scales with batch size, not table size — the property that
   keeps this viable when the latest-table is itself ~10^11 rows.
3. The rewrite is crash-safe: staged write, then per-bucket swap that
   RENAMES the old partition aside before renaming the staged one in —
   old rows always live in either `bucket=N` or the `.old-*` aside dir,
   never deleted before the replacement is in place. A `_last_batch`
   marker makes a foreachBatch REPLAY of an applied batch a no-op, and an
   interrupted swap is rolled forward on the next merge (restore missing
   buckets from the aside dir; re-merging over an already-merged bucket is
   idempotent because the winner reduction is). On a real deployment the
   sink is an Iceberg/Delta `MERGE INTO` and steps 2-3 are the table
   format's copy-on-write commit; the bucket layout, winner reduction, and
   idempotency contract are identical.

Scale contract: state-table shuffle key is the canonical-url string only
inside each touched bucket's re-reduction (bounded); the stream plan itself
is STATELESS (no watermark state — all history lives in the table), and a
microbatch of b rows costs one hash agg over b rows plus a scan of the
touched buckets. Reference anchor: the fetch-else-recompute refresh
semantics of isimip_qa/mixins/extractions.py:18-28
(RemoteExtractionMixin.fetch writes the newer remote artifact over the
local path) gated per run at isimip_qa/main.py:127, lifted to per-URL
streaming granularity."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import SCHEMAS
from ..queries.urlops import capture_rows

N_BUCKETS = 16
_MARKER = "_last_batch"


def _bucketed(rows: DataFrame) -> DataFrame:
    return rows.withColumn(
        "bucket", F.pmod(F.xxhash64("canon_url"), F.lit(N_BUCKETS))
    )


def _winners_of(rows: DataFrame) -> DataFrame:
    """Reduce (canon_url, doc_id, capture, bucket) rows to one winner per
    canonical URL: max capture, min doc_id among capture ties — a single
    struct-max hash aggregation (negated doc_id makes the max pick the
    min). Grouping by (canon_url, bucket) is equivalent to canon_url alone
    (bucket is a pure function of it) and keeps the partition column."""
    return (
        rows.groupBy("canon_url", "bucket")
        .agg(
            F.max(
                F.struct(
                    F.col("capture"), (-F.col("doc_id")).alias("neg_doc")
                )
            ).alias("w")
        )
        .select(
            "canon_url",
            (-F.col("w.neg_doc")).alias("doc_id"),
            F.col("w.capture").alias("capture"),
            "bucket",
        )
    )


def _recover_interrupted_swap(state_dir: str) -> None:
    """Roll an interrupted per-bucket swap forward: any bucket still in an
    aside dir but missing from the table is restored (its swap never
    completed); buckets present in BOTH places keep the table copy (their
    swap completed — the aside copy is superseded). Then the aside dirs go
    away. Re-merging the triggering batch afterwards is idempotent."""
    for d in os.listdir(state_dir):
        if not d.startswith(".old-"):
            continue
        aside = os.path.join(state_dir, d)
        for b in os.listdir(aside):
            dst = os.path.join(state_dir, b)
            if not os.path.isdir(dst):
                os.replace(os.path.join(aside, b), dst)
        shutil.rmtree(aside, ignore_errors=True)


def merge_batch(
    spark: SparkSession, batch: DataFrame, state_dir: str, batch_id: int
) -> None:
    """Idempotent MERGE of one microbatch into the latest-capture table."""
    marker = os.path.join(state_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == str(batch_id):
                return  # foreachBatch replay of an applied batch: no-op
    _recover_interrupted_swap(state_dir)
    new = _winners_of(_bucketed(capture_rows(batch))).persist()
    try:
        touched = sorted(
            r["bucket"] for r in new.select("bucket").distinct().collect()
        )  # bounded by N_BUCKETS — never corpus-sized
        if not touched:
            return
        existing_dirs = [
            os.path.join(state_dir, f"bucket={b}")
            for b in touched
            if os.path.isdir(os.path.join(state_dir, f"bucket={b}"))
        ]
        if existing_dirs:
            existing = (
                spark.read.schema(
                    "canon_url string, doc_id long, capture long"
                )
                .option("basePath", state_dir)
                .parquet(*existing_dirs)
                .select("canon_url", "doc_id", "capture", "bucket")
            )
            merged = _winners_of(existing.unionByName(new))
        else:
            merged = new
        staging = os.path.join(state_dir, f".staging-{batch_id}")
        (
            merged.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(staging)
        )
    finally:
        new.unpersist()
    # crash-safe swap of ONLY the touched bucket partitions (the
    # Iceberg/Delta analogue is the MERGE commit): old partition renamed
    # ASIDE (never deleted first), staged partition renamed in, aside dirs
    # dropped only after every bucket is in place. A crash at any point
    # leaves each bucket's previous rows in exactly one of the two dirs,
    # and _recover_interrupted_swap + idempotent re-merge finish the job.
    aside = os.path.join(state_dir, f".old-{batch_id}")
    os.makedirs(aside, exist_ok=True)
    for b in touched:
        src = os.path.join(staging, f"bucket={b}")
        dst = os.path.join(state_dir, f"bucket={b}")
        if os.path.isdir(src):
            if os.path.isdir(dst):
                os.replace(dst, os.path.join(aside, f"bucket={b}"))
            os.replace(src, dst)
    shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    with open(marker, "w") as fh:
        fh.write(str(batch_id))


def url_latest_stream(spark: SparkSession, src_dir: str, state_dir: str):
    """Maintain `{state_dir}/bucket=*/` = latest capture per canonical URL
    over a stream of document batches. Returns the StreamingQuery
    (availableNow trigger; rerun after new files arrive to catch up)."""
    os.makedirs(state_dir, exist_ok=True)
    docs = spark.readStream.schema(SCHEMAS["documents"]).parquet(src_dir)

    def _merge(batch: DataFrame, batch_id: int) -> None:
        merge_batch(spark, batch, state_dir, batch_id)

    return (
        docs.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", f"{state_dir}/_chk")
        .trigger(availableNow=True)
        .start()
    )
