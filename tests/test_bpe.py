"""BPE trainer (operators/bpe.py) vs the pure-Python golden, consistency
with the registered bpe_merge_pairs statistic and the shipped BPE_MERGES
config, and the zero-shuffle plan of the application query."""

from __future__ import annotations

from pyspark.sql import functions as F

from isimip_qa_spark.catalog import read_table
from isimip_qa_spark.operators.bpe import (
    train_bpe,
    train_bpe_python,
    word_vocab,
)
from isimip_qa_spark.queries.textmodel import (
    BPE_MERGES,
    bpe_len_expr,
    bpe_segment,
)
from tests.test_plans import plan_of

SF_DIR = "/root/testdata/sf0.001"


def test_trainer_matches_golden(spark):
    v = [
        ("hello", 5),
        ("help", 3),
        ("hell", 2),
        ("low", 4),
        ("lower", 2),
        ("the", 10),
        ("then", 4),
    ]
    df = spark.createDataFrame(v, "w string, c long")
    assert train_bpe(df, 6) == train_bpe_python(v, 6)


def test_trainer_matches_golden_on_corpus_vocab(spark):
    vocab = word_vocab(read_table(spark, SF_DIR, "documents"))
    v = [(r.w, r.c) for r in vocab.collect()]
    assert train_bpe(vocab, 5) == train_bpe_python(v, 5)


def test_shipped_merges_are_the_trained_prefix(spark):
    """BPE_MERGES' docstring claim: its leading entries are this corpus's
    trained merges."""
    vocab = word_vocab(read_table(spark, SF_DIR, "documents"))
    assert train_bpe(vocab, 4) == BPE_MERGES[:4]


def test_first_merge_is_top_pair_statistic(spark):
    """Iteration 1 of the trainer must pick bpe_merge_pairs' max-count
    pair (same statistic, same tie-break)."""
    from isimip_qa_spark.queries.textmodel import bpe_merge_pairs

    top = (
        bpe_merge_pairs(spark, SF_DIR)
        .orderBy(F.desc("n_pairs"), "lhs", "rhs")
        .limit(1)
        .collect()[0]
    )
    vocab = word_vocab(read_table(spark, SF_DIR, "documents"))
    assert train_bpe(vocab, 1) == [(top.lhs, top.rhs)]


def test_segment_lengths(spark):
    rows = (
        spark.createDataFrame(
            [("error",), ("x",), ("inward",), ("erer",), ("",)], "w string"
        )
        .select(bpe_len_expr(F.col("w")).alias("n"))
        .collect()
    )
    # error: e r r o r -(e,r)-> er r o r -(o,r)-> er r or = 3
    # x: single char = 1
    # inward: i n w a r d -(i,n)-> in w a r d -(a,r)-> in w ar d = 4
    # erer: e r e r -(e,r)-> er er = 2  (ADJACENT occurrences must both
    #       merge — the single-space representation stalled at 'er e r')
    # '': empty token prices to 0 (matches the via-vocab dim path)
    assert [r.n for r in rows] == [3, 1, 4, 2, 0]


def test_adjacent_and_whitespace_symbol_merges(spark):
    """Canonical-BPE regression cases: runs of the same pair ('aaaa' with
    (a,a) -> 'aa aa', never 'aa a a') and words containing newline chars
    (the (?s) dotall: '\\n' is a real symbol, not dropped)."""
    from isimip_qa_spark.operators.bpe import train_bpe, train_bpe_python

    v = [("aaaa", 10), ("aa", 3)]
    df = spark.createDataFrame(v, "w string, c long")
    got = train_bpe(df, 2)
    assert got == train_bpe_python(v, 2)
    # first merge is (a,a) with count 10*3+3*1 = 33 (three adjacent pairs
    # in 'aaaa'); after a leftmost-greedy rewrite 'aaaa'-> 'aa aa' the
    # second merge must be (aa, aa) — the stalled rewrite 'aa a a' would
    # pick (aa, a) instead
    assert got == [("a", "a"), ("aa", "aa")]

    vn = [("a\nb", 5), ("a\nb\nb", 2)]
    dfn = spark.createDataFrame(vn, "w string, c long")
    assert train_bpe(dfn, 3) == train_bpe_python(vn, 3)


def test_bpe_segment_zero_shuffle(spark):
    plan = plan_of(bpe_segment(spark, SF_DIR))
    # the only allowed exchange is the final orderBy's range partitioning;
    # no hash exchange (no join/agg) anywhere
    assert "hashpartitioning" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dim_path_equals_expr_path(spark):
    """The broadcast word->n_subwords production path must price every doc
    identically to the pure-expr path (both run the same replace chain)."""
    from isimip_qa_spark.operators.bpe import bpe_counts_via_vocab

    docs = read_table(spark, SF_DIR, "documents")
    via_dim = {
        r.doc_id: r.n_tok_bpe
        for r in bpe_counts_via_vocab(docs).collect()
    }
    via_expr = {
        r.doc_id: r.n_tok_bpe for r in bpe_segment(spark, SF_DIR).collect()
    }
    assert via_dim == via_expr
    plan = plan_of(bpe_counts_via_vocab(docs))
    assert "BroadcastHashJoin" in plan


def _sennrich_len(word: str, merges) -> int:
    """Canonical BPE merge application (Sennrich et al. 2016 reference
    implementation's lookaround-regex form) — an INDEPENDENT semantic
    anchor: our replace-on-self-delimited-symbols must agree with it.
    (Single-space representation here, so restricted to words without
    whitespace-class chars — the canonical form is ambiguous on those.)"""
    import re

    if not word:
        return 0
    rep = " ".join(word)
    for lhs, rhs in merges:
        pat = re.compile(
            r"(?<!\S)" + re.escape(lhs + " " + rhs) + r"(?!\S)"
        )
        rep = pat.sub(lhs + rhs, rep)
    return len(rep.split(" "))


def test_segmentation_matches_canonical_sennrich(spark):
    from isimip_qa_spark.queries.textmodel import BPE_MERGES

    words = [
        "erer", "ererer", "oror", "stst", "parpar", "lululu",
        "error", "inward", "stopwords", "lurid", "particular",
        "x", "paar", "arar", "stlu", "erst", "paren",
    ]
    got = {
        r.w: r.n
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", bpe_len_expr(F.col("w")).alias("n"))
        .collect()
    }
    want = {w: _sennrich_len(w, BPE_MERGES) for w in words}
    assert got == want
