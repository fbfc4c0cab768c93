"""Containment catches the partial-duplication pair Jaccard misses: a
short page quoted wholesale inside a long one must flag with containment
1.0 while its Jaccard stays below every dedup threshold."""

from __future__ import annotations

from isimip_qa_spark.queries.dedup import (
    CONTAIN_THRESHOLD,
    JACCARD_THRESHOLD,
    containment_pairs,
)

SHORT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _filler(n: int, tag: str) -> str:
    return " ".join(f"{tag}{i}a {tag}{i}b {tag}{i}c" for i in range(n))


def test_quoted_page_flags_on_containment_not_jaccard(spark):
    # quote inside noise; the two filler runs differ so the long doc's
    # shingle set is dominated by non-quote material
    long_doc = f"{_filler(40, 'w')} {SHORT} {_filler(40, 'v')}"
    texts = {
        0: SHORT,
        1: long_doc,
        2: _filler(35, "u"),  # unrelated, token-disjoint
    }
    reps = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {(r.doc_a, r.doc_b): r for r in containment_pairs(reps).collect()}
    assert (0, 1) in got
    r = got[(0, 1)]
    # the short doc's shingles are a strict subset of the long doc's
    assert r.containment == 1.0
    # and symmetric Jaccard would never have flagged this pair
    assert r.jaccard < JACCARD_THRESHOLD
    assert r.containment >= CONTAIN_THRESHOLD
    assert not any(2 in p for p in got)
