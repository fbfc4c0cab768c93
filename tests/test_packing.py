"""Sequence packing: span invariants, determinism, and the hierarchical
prefix-sum plan shape (no global single-partition window)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from isimip_qa_spark.queries.packing import SEQ_LEN, pack_sequences

SF = "/root/testdata/sf0.01"


def test_pack_sequences_span_invariants(spark):
    rows = pack_sequences(spark, SF).collect()
    assert rows

    # (1) every sequence except the final one is exactly SEQ_LEN tokens;
    #     sequence ids are contiguous from 0
    per_seq = defaultdict(int)
    for r in rows:
        per_seq[r["seq_id"]] += r["len"]
    seq_ids = sorted(per_seq)
    assert seq_ids == list(range(len(seq_ids)))
    for s in seq_ids[:-1]:
        assert per_seq[s] == SEQ_LEN
    assert 0 < per_seq[seq_ids[-1]] <= SEQ_LEN

    # (2) each document's spans tile it exactly: doc_starts chain from 0
    #     and cover ws-token count with no gap or overlap
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for doc_id, spans in per_doc.items():
        spans.sort(key=lambda r: r["seq_id"])
        pos = 0
        for sp in spans:
            assert sp["doc_start"] == pos
            assert 0 <= sp["seq_start"] < SEQ_LEN
            assert sp["seq_start"] + sp["len"] <= SEQ_LEN
            pos += sp["len"]
        assert pos == n_tokens[doc_id]

    # (3) within a sequence, spans tile the sequence without overlap
    by_seq = defaultdict(list)
    for r in rows:
        by_seq[r["seq_id"]].append(r)
    for s, spans in by_seq.items():
        spans.sort(key=lambda r: r["seq_start"])
        pos = 0
        for sp in spans:
            assert sp["seq_start"] == pos
            pos += sp["len"]


def test_pack_sequences_deterministic_and_parallel_plan(spark):
    df = pack_sequences(spark, SF)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, pack_sequences(spark, SF).collect()))
    assert a == b  # div-blocked prefix sum: no sampling, stable run-to-run

    # the only window is partitioned by the block key — a global
    # Window.orderBy would show an Exchange SinglePartition feeding it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(pid" in plan.lower() or "pid" in plan


def test_pack_assemble_materializes_exact_sequences(spark):
    from isimip_qa_spark.queries.packing import pack_assemble

    rows = pack_assemble(spark, SF).collect()
    by_seq = {r["seq_id"]: r for r in rows}
    last = max(by_seq)
    for s, r in by_seq.items():
        n = len(r["seq_text"].split(" "))
        assert n == r["n_tokens"]
        if s != last:
            assert n == SEQ_LEN
    # global reconstruction: concatenating sequences in seq_id order equals
    # concatenating documents in doc_id order
    joined = " ".join(by_seq[s]["seq_text"] for s in sorted(by_seq))
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    original = " ".join(
        d["text"] for d in sorted(docs, key=lambda d: d["doc_id"])
        if d["text"]
    )
    assert joined == original
