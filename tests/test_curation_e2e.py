"""End-to-end recipe for the late-round-3 operators, composed the way a
real curation run chains them:

  near-dup clusters → keep-best winner per cluster → winner corpus
  → verified JSONL shard export → consumer-side re-verification,

with the invariants that make the composition correct (exactly one winner
per cluster, winners are real docs, export ships exactly the winner set,
re-export is bit-stable)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from isimip_qa_spark.catalog import read_table
from isimip_qa_spark.plans.export import export_jsonl_shards, verify_export
from isimip_qa_spark.queries.dedup import dedup_clusters
from isimip_qa_spark.queries.selection import dedup_keep_best

SF_DIR = "/root/testdata/sf0.001"


def test_cluster_keepbest_export_chain(spark, tmp_path):
    docs = read_table(spark, SF_DIR, "documents")
    clusters = dedup_clusters(spark, SF_DIR)
    winners = dedup_keep_best(spark, SF_DIR)

    # exactly one winner per cluster, and every winner is a cluster member
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert winners.count() == n_clusters
    assert (
        winners.join(
            clusters,
            ["cluster_id", "doc_id"],
            "left_anti",
        ).count()
        == 0
    )

    # winner corpus = docs restricted to winning ids (broadcast semi-join)
    kept = docs.join(
        F.broadcast(winners.select("doc_id")), "doc_id", "semi"
    )
    n_kept = kept.count()
    assert n_kept == n_clusters

    # export ships exactly the winner set, shard-verified
    out = str(tmp_path / "export")
    r = export_jsonl_shards(kept, out, n_shards=4)
    assert r.n_docs == n_kept
    assert verify_export(spark, out)

    # the winner set reaches the consumer intact (ids round-trip)
    back = spark.read.json(os.path.join(out, "data"))
    assert {x.doc_id for x in back.select("doc_id").collect()} == {
        x.doc_id for x in winners.select("doc_id").collect()
    }

    # re-export of the same winner corpus is bit-stable (manifest equal)
    out2 = str(tmp_path / "export2")
    export_jsonl_shards(kept, out2, n_shards=4)
    m1 = json.load(open(os.path.join(out, "manifest.json")))
    m2 = json.load(open(os.path.join(out2, "manifest.json")))
    assert m1 == m2
