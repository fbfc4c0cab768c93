"""Training-data export sink: compressed JSONL shards + verified manifest.

The last step of the curation pipeline is not a query — it is shipping the
selected corpus to the training stack, which consumes line-delimited JSON
(or webdataset-style shards), not parquet. This writer:

- assigns every doc its content-fingerprint shard (the SAME mod-N key as
  `shard_manifest` / `shard_shuffle` in queries/mixing.py, so the shard a
  doc exports to is a pure function of its text — re-exports are stable
  and the manifest query predicts the layout);
- writes one directory per shard (`shard_id=K/`) of compressed JSONL via
  Spark's native JSON sink — executors write in parallel, the driver never
  sees document bytes. Default codec is gzip (pure-JVM, always present);
  on a cluster with the Hadoop native zstd codec loaded pass
  codec="zstd" — this sandbox lacks libhadoop, so gzip is the tested
  default (the parquet metrics sink, plans/sink.py, uses zstd via
  parquet-mr, which needs no native lib — different codepath);
- recomputes the per-shard manifest FROM THE WRITTEN FILES (read-back) and
  verifies it against the manifest computed from the source frame:
  (n_docs, n_tokens, bit_xor-of-fingerprint checksum) must match exactly,
  or the export raises. The checksum is order-independent (XOR), so the
  nondeterministic line order inside a shard — concurrent writer tasks —
  does not affect it. This is the cross-engine/transfer integrity contract
  `shard_manifest` documents, enforced at the moment the bytes leave the
  engine.

Scale shape (100 TB): ONE exchange keyed on the 8-byte shard id (the
repartition that makes each shard a contiguous writer task set); JSON
encode + zstd happen executor-side; the source manifest is collected
DURING the write by an Observation node (per-shard conditional
aggregates — no re-execution of the upstream plan, which in the
curation chain includes dedup joins); the verify pass is ONE scan of
the written shards (unavoidable for read-back integrity — it is the
cheap, embarrassingly parallel half) feeding an N_SHARDS-key hash agg
that yields the read-back manifest and the misplaced-row count
together. The driver handles only the 2×N_SHARDS manifest rows. Shard count at
10^12 docs follows the shard-size rule (shard ≈ fixed bytes ⇒ N grows
with corpus; the exchange stays balanced because the fingerprint is
uniform).

Reference anchor: isimip_qa/mixins/extractions.py writes per-extraction
CSV artifacts with config-hash skip guards; this is the corpus-scale
analogue with the guard covering data bytes, not config.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textstats as ts
from ..functions.fingerprint import rolling_fingerprint_expr

EXPORT_SHARDS = 16
# above this shard count the write-time Observation (3 aggregate exprs per
# shard) would bloat the plan; fall back to a separate source manifest pass
_OBSERVE_MAX = 64


@dataclass
class ExportResult:
    out_dir: str
    n_shards: int
    n_docs: int
    n_tokens: int
    manifest_path: str


def _manifest_df(df: DataFrame, n_shards: int) -> DataFrame:
    """(shard_id, n_docs, n_tokens, checksum) from any (doc_id, text, ...)
    frame — identical semantics to the `shard_manifest` registered query."""
    fp = rolling_fingerprint_expr(ts.tokens_expr(F.col("text")))
    return (
        df.select(
            F.pmod(fp, F.lit(n_shards)).alias("shard_id"),
            fp.alias("fp"),
            ts.n_words_expr(F.col("text")).alias("n_tokens"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.expr("bit_xor(fp)").alias("checksum"),
        )
    )


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = EXPORT_SHARDS,
    codec: str = "gzip",
) -> ExportResult:
    """Write `df` (must carry a NON-NULL `text` column; every other column
    is exported alongside it) as `out_dir/data/shard_id=K/*.json.<codec>`
    and a verified `out_dir/manifest.json`. Raises RuntimeError if the
    read-back manifest of ANY shard disagrees with the source manifest,
    or if any row has NULL text (no content fingerprint ⇒ no shard)."""
    spark = df.sparkSession
    # fingerprint + token count computed ONCE, pre-shuffle: shard_id
    # derives from __fp, and both ride the exchange as 16 bytes/row so
    # the Observation never re-tokenizes the document text
    keyed = (
        df.withColumn(
            "__fp", rolling_fingerprint_expr(ts.tokens_expr(F.col("text")))
        )
        .withColumn("shard_id", F.pmod(F.col("__fp"), F.lit(n_shards)))
        .withColumn("__nt", ts.n_words_expr(F.col("text")))
    )
    data_dir = os.path.join(out_dir, "data")

    # Source manifest: collected DURING the write via an Observation node
    # (per-shard conditional aggregates), so the upstream plan — which in
    # the curation chain includes dedup clustering joins — executes ONCE.
    # 3 aggregate exprs per shard is fine at ordinary shard counts; past
    # _OBSERVE_MAX we fall back to a separate source aggregation pass.
    obs = None
    write_src = keyed
    if n_shards <= _OBSERVE_MAX:
        from pyspark.sql import Observation

        obs = Observation()
        metrics = [
            F.sum(F.col("__fp").isNull().cast("long")).alias("nulls")
        ]
        for s in range(n_shards):
            hit = F.col("shard_id") == s
            metrics += [
                F.sum(hit.cast("long")).alias(f"d{s}"),
                F.sum(F.when(hit, F.col("__nt"))).alias(f"t{s}"),
                F.expr(
                    f"bit_xor(case when shard_id = {s} then __fp end)"
                ).alias(f"c{s}"),
            ]
        write_src = write_src.observe(obs, *metrics)
    (
        write_src.repartition(n_shards, "shard_id")
        .drop("__fp", "__nt")
        .write.partitionBy("shard_id")
        .option("compression", codec)
        .mode("overwrite")
        .json(data_dir)
    )
    if obs is not None:
        got = obs.get
        n_null = got["nulls"] or 0
        expected = {
            s: (got[f"d{s}"], got[f"t{s}"], got[f"c{s}"])
            for s in range(n_shards)
            if got[f"d{s}"]  # empty shards have no dir and no manifest row
        }
    else:
        expected = {
            r.shard_id: (r.n_docs, r.n_tokens, r.checksum)
            for r in _manifest_df(keyed, n_shards).collect()
        }
        n_null = sum(v[0] for k, v in expected.items() if k is None)
        expected.pop(None, None)
    if n_null:
        raise RuntimeError(
            f"{n_null} rows have NULL text (no content fingerprint) — "
            "a training-shard export cannot place or verify them; filter "
            "null-text rows before exporting"
        )
    # read-back: shard_id comes from the partition dir, text from the
    # lines. ONE scan yields both integrity checks: the per-shard manifest
    # AND the count of rows whose dir disagrees with their content shard.
    back = spark.read.json(data_dir)
    fp2 = rolling_fingerprint_expr(ts.tokens_expr(F.col("text")))
    back_agg = (
        back.select(
            "shard_id",
            fp2.alias("fp"),
            ts.n_words_expr(F.col("text")).alias("n_tokens"),
            (F.col("shard_id") != F.pmod(fp2, F.lit(n_shards)))
            .cast("long")
            .alias("misplaced"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.expr("bit_xor(fp)").alias("checksum"),
            F.sum("misplaced").alias("misplaced"),
        )
        .collect()
    )
    actual = {
        r.shard_id: (r.n_docs, r.n_tokens, r.checksum) for r in back_agg
    }
    if actual != expected:
        bad = {
            k
            for k in expected.keys() | actual.keys()
            if expected.get(k) != actual.get(k)
        }
        raise RuntimeError(
            f"export integrity check failed for shards {sorted(bad)}: "
            f"expected {expected} got {actual}"
        )
    mismatched = sum(r.misplaced for r in back_agg)
    if mismatched:
        raise RuntimeError(
            f"{mismatched} rows landed in the wrong shard directory"
        )

    manifest = {
        "n_shards": n_shards,
        "codec": codec,
        "shards": {
            str(k): {
                "n_docs": int(v[0]),
                "n_tokens": int(v[1]),
                "checksum": int(v[2]),
            }
            for k, v in sorted(expected.items())
        },
    }
    manifest_path = os.path.join(out_dir, "manifest.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return ExportResult(
        out_dir=out_dir,
        n_shards=n_shards,
        n_docs=sum(v[0] for v in expected.values()),
        n_tokens=sum(v[1] for v in expected.values()),
        manifest_path=manifest_path,
    )


def verify_export(spark: SparkSession, out_dir: str) -> bool:
    """Consumer-side check: recompute the manifest from the shard files and
    compare with manifest.json (what a training job runs before trusting a
    transferred corpus). Returns True iff every shard matches."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    back = spark.read.json(os.path.join(out_dir, "data"))
    actual = {
        str(r.shard_id): (int(r.n_docs), int(r.n_tokens), int(r.checksum))
        for r in _manifest_df(back, int(manifest["n_shards"])).collect()
    }
    expected = {
        k: (v["n_docs"], v["n_tokens"], v["checksum"])
        for k, v in manifest["shards"].items()
    }
    return actual == expected
