"""JSONL shard export: round-trip fidelity, manifest verification (both
the writer's built-in check and the consumer-side verify), tamper
detection, and layout stability (same corpus → same shard for every doc).
"""

from __future__ import annotations

import glob
import gzip
import json
import os

from isimip_qa_spark.catalog import read_table
from isimip_qa_spark.plans.export import (
    export_jsonl_shards,
    verify_export,
)

SF_DIR = "/root/testdata/sf0.001"


def test_export_round_trip(spark, tmp_path):
    d = read_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "exp")
    r = export_jsonl_shards(d, out, n_shards=8)
    assert r.n_docs == d.count()
    # every doc comes back byte-identical
    back = spark.read.json(os.path.join(out, "data"))
    src = {x.doc_id: x.text for x in d.collect()}
    got = {x.doc_id: x.text for x in back.collect()}
    assert got == src
    # one dir per shard, compressed part files inside
    dirs = sorted(
        p
        for p in os.listdir(os.path.join(out, "data"))
        if p.startswith("shard_id=")
    )
    assert len(dirs) == 8
    parts = glob.glob(os.path.join(out, "data", "shard_id=*", "*.json.gz"))
    assert parts
    # consumer-side verify passes
    assert verify_export(spark, out)


def test_export_manifest_matches_query(spark, tmp_path):
    """manifest.json must equal the registered shard_manifest query's
    answer at the same shard count (the export layout is the query's
    prediction)."""
    from isimip_qa_spark.queries.mixing import N_SHARDS, shard_manifest

    d = read_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "exp")
    export_jsonl_shards(d, out, n_shards=N_SHARDS)
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    q = {
        str(r.shard_id): {
            "n_docs": r.n_docs,
            "n_tokens": r.n_tokens,
            "checksum": r.checksum,
        }
        for r in shard_manifest(spark, SF_DIR).collect()
    }
    assert manifest["shards"] == q


def test_verify_detects_tamper(spark, tmp_path):
    d = read_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "exp")
    export_jsonl_shards(d, out, n_shards=4)
    assert verify_export(spark, out)
    # flip one document's text inside one part file
    part = glob.glob(os.path.join(out, "data", "shard_id=*", "*.json.gz"))[0]
    lines = gzip.open(part, "rt").read().splitlines()
    row = json.loads(lines[0])
    row["text"] = row["text"] + " tampered"
    lines[0] = json.dumps(row)
    with gzip.open(part, "wt") as f:
        f.write("\n".join(lines) + "\n")
    # drop the Hadoop CRC sidecar: local-FS checksum would reject the read
    # first; the point here is that the MANIFEST layer catches tampering
    # even on filesystems without CRC sidecars (S3/HDFS transfers)
    crc = os.path.join(
        os.path.dirname(part), "." + os.path.basename(part) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    assert not verify_export(spark, out)


def test_export_layout_stable(spark, tmp_path):
    """Re-exporting the same corpus puts every doc in the same shard —
    the manifest (counts + checksums) is bit-identical across runs."""
    d = read_table(spark, SF_DIR, "documents")
    m = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        export_jsonl_shards(d, out, n_shards=8)
        m.append(json.load(open(os.path.join(out, "manifest.json"))))
    assert m[0] == m[1]


def test_export_rejects_null_text(spark, tmp_path):
    """NULL text has no content fingerprint: the export must fail with an
    explicit message, not a cryptic shard-manifest mismatch."""
    import pytest

    d = spark.createDataFrame(
        [(1, "real doc text"), (2, None)], "doc_id long, text string"
    )
    with pytest.raises(RuntimeError, match="NULL text"):
        export_jsonl_shards(d, str(tmp_path / "out"), n_shards=4)
