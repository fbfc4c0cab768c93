"""Planted-duplicate tests for the substring-span dedup and the Bloom
membership prefilter (round-3 additions).

- substring spans: exact agreement with a brute-force string-semantics
  reference (the engine's hashed gram keys must not change the answer at
  test scale), correct interval merging for overlapping / adjacent /
  disjoint passages, and short-doc (< k tokens) safety.
- bloom: no-false-negative by construction (every exact duplicate is a
  bloom hit), exact_hit ⇒ bloom_hit, agreement with an independent Python
  md5/double-hashing model of the same bitmap, and a plan assertion that
  the probe side is exchange-free (the whole point of the prefilter).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from isimip_qa_spark.queries.bloom import M_BITS, N_HASH, bloom_flags
from isimip_qa_spark.queries.substring import K_GRAM


def _spans_bruteforce(texts: dict[int, str], k: int) -> set[tuple]:
    """(doc_id, span_start, span_end, n_dup_grams) by string semantics."""
    from collections import Counter

    grams: Counter = Counter()
    occ: dict[int, list[int]] = {}
    for did, t in texts.items():
        toks = t.split(" ")
        occ[did] = []
        for i in range(max(len(toks) - k + 1, 0)):
            grams[" ".join(toks[i : i + k])] += 1
    out = set()
    for did, t in texts.items():
        toks = t.split(" ")
        pos = [
            i
            for i in range(max(len(toks) - k + 1, 0))
            if grams[" ".join(toks[i : i + k])] >= 2
        ]
        cur = None
        for p in pos:
            if cur is not None and p <= cur[1] + 1:
                cur = (cur[0], max(cur[1], p + k - 1), cur[2] + 1)
            else:
                if cur:
                    out.add((did,) + cur[:2] + (cur[2],))
                cur = (p, p + k - 1, 1)
        if cur:
            out.add((did,) + cur[:2] + (cur[2],))
    return out


def _write_docs(spark, texts: dict[int, str], out: str) -> None:
    """Planted corpus in the full `documents` schema read_table expects."""
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(out + "/documents.parquet")


PASSAGE = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens


def test_substring_spans_match_bruteforce(spark, tmp_path):
    texts = {
        0: f"one two three {PASSAGE} four five six",
        1: f"seven eight {PASSAGE} nine ten eleven twelve",
        2: "unique words only here nothing repeats at all today",
        3: "tiny doc",  # < K_GRAM tokens: must not crash, no spans
        # within-doc repetition: the same 5-gram twice in one doc
        4: "p q r s t filler filler2 p q r s t tail",
    }
    out = str(tmp_path / "docs")
    _write_docs(spark, texts, out)

    from isimip_qa_spark.queries.substring import dedup_substring_spans

    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
        for r in dedup_substring_spans(spark, out).collect()
    }
    assert got == _spans_bruteforce(texts, K_GRAM)
    # the shared passage is 7 tokens => 3 overlapping 5-grams merged into
    # ONE span of width 7 in each of the two docs
    widths = {
        r[0]: (r[2] - r[1] + 1, r[3]) for r in got if r[0] in (0, 1)
    }
    assert widths == {0: (7, 3), 1: (7, 3)}
    assert 2 not in {r[0] for r in got} and 3 not in {r[0] for r in got}
    assert {r for r in got if r[0] == 4} == {(4, 0, 4, 1), (4, 7, 11, 1)}


def test_substring_adjacent_spans_merge(spark, tmp_path):
    # doc 0/1 share gram A at doc0 pos 0-4; doc 0/2 share gram B at doc0
    # pos 5-9: adjacent (pos 5 == prev_end+1) => ONE merged span [0, 9].
    a = "a1 a2 a3 a4 a5"
    b = "b1 b2 b3 b4 b5"
    texts = {0: f"{a} {b}", 1: f"x y z {a}", 2: f"{b} q r s"}
    out = str(tmp_path / "docs2")
    _write_docs(spark, texts, out)
    from isimip_qa_spark.queries.substring import dedup_substring_spans

    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup_substring_spans(spark, out).collect()
        if r.doc_id == 0
    }
    assert got == {(0, 0, 9)}


def _py_digests(text: str) -> tuple[int, int]:
    h = hashlib.md5(text.encode()).hexdigest()
    return int(h[0:15], 16), int(h[16:31], 16)


def test_bloom_planted_duplicates(spark):
    hist_texts = {i * 2: f"history page number {i} body" for i in range(50)}
    cur_texts = {i * 2 + 1: f"arriving page number {i} body" for i in range(50)}
    # plant 5 exact re-crawls
    for i in range(5):
        cur_texts[i * 2 + 1] = hist_texts[i * 2]
    texts = {**hist_texts, **cur_texts}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    res = {r.doc_id: (r.bloom_hit, r.exact_hit) for r in bloom_flags(docs).collect()}
    assert len(res) == 50  # odd docs only
    # no false negatives: every planted re-crawl is bloom-hit AND exact-hit
    for i in range(5):
        assert res[i * 2 + 1] == (True, True)
    # exact_hit implies bloom_hit everywhere
    assert all(b or not e for b, e in res.values())
    # independent Python model of the same bitmap agrees on every flag
    bits = set()
    for t in hist_texts.values():
        h1, h2 = _py_digests(t)
        bits.update((h1 + i * h2) % M_BITS for i in range(N_HASH))
    hist_keys = {_py_digests(t) for t in hist_texts.values()}
    for did, (bloom_hit, exact_hit) in res.items():
        h1, h2 = _py_digests(texts[did])
        want_bloom = all((h1 + i * h2) % M_BITS in bits for i in range(N_HASH))
        assert bloom_hit == want_bloom
        assert exact_hit == (want_bloom and (h1, h2) in hist_keys)


def test_bloom_probe_side_is_exchange_free(spark):
    """The prefilter's scale contract: computing bloom_hit over the
    arriving side is a pure map — no exchange before the (pruned) exact
    join. Assert on the flagged subplan the query builds internally."""
    from isimip_qa_spark.queries.bloom import _digests, _positions

    docs = spark.createDataFrame(
        [(i, f"page {i}") for i in range(20)], "doc_id long, text string"
    )
    d = _digests(docs).filter(F.col("doc_id") % 2 == 1)
    bitmap = F.lit([0] * (M_BITS // 64))

    def bit_set(p):
        word = F.element_at(bitmap, F.shiftright(p, 6) + 1)
        return F.getbit(word, p.bitwiseAND(F.lit(63))) == 1

    flagged = d.withColumn("bloom_hit", F.forall(_positions(), bit_set))
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_doc_dup_coverage_matches_spans(spark, tmp_path):
    texts = {
        0: f"one two three {PASSAGE} four five six",
        1: f"seven eight {PASSAGE} nine ten eleven twelve",
        2: "unique words only here nothing repeats at all today",
        3: "tiny doc",
    }
    out = str(tmp_path / "docs3")
    _write_docs(spark, texts, out)
    from isimip_qa_spark.queries.substring import doc_dup_coverage

    got = {r.doc_id: r for r in doc_dup_coverage(spark, out).collect()}
    spans = _spans_bruteforce(texts, K_GRAM)
    for did, t in texts.items():
        n = len(t.split(" "))
        dup = sum(e - s + 1 for d, s, e, _ in spans if d == did)
        r = got[did]
        assert (r.n_tokens, r.dup_tokens) == (n, dup)
        assert r.dup_frac == dup / n
    assert got[0].dup_tokens == 7 and got[3].dup_tokens == 0


def test_bpe_merge_pairs_bruteforce(spark, tmp_path):
    from collections import Counter

    texts = {0: "ab ab cd", 1: "abc", 2: "a bb"}
    out = str(tmp_path / "docs4")
    _write_docs(spark, texts, out)
    from isimip_qa_spark.queries.textmodel import bpe_merge_pairs

    got = {
        (r.lhs, r.rhs): r.n_pairs
        for r in bpe_merge_pairs(spark, out).collect()
    }
    vocab = Counter(w for t in texts.values() for w in t.split(" "))
    want: Counter = Counter()
    for w, c in vocab.items():
        for i in range(len(w) - 1):
            want[(w[i], w[i + 1])] += c
    assert got == dict(want)
    assert got[("a", "b")] == 3  # 2x 'ab' + 1x 'abc'
