"""Per-source JS divergence vs the corpus unigram distribution: analytic
answer on a planted two-source corpus (pure-Python reference mirroring the
1/QD dyadic term quantization), exact vocabulary-coverage fields, and the
plan contract (one corpus-scale exchange, broadcast catalog sides)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from isimip_qa_spark.queries.datasheet import QD, source_divergence

DOCS = [
    (0, "a a b", "en", "srcA"),
    (1, "b c", "en", "srcB"),
    (2, "a c c d", "en", "srcB"),
]


def _ref():
    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for _, text, _, src in DOCS:
        toks = text.split(" ")
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    n_tot = sum(corpus.values())

    def q_half_away(x: float) -> float:
        return math.copysign(math.floor(abs(x) * QD + 0.5), x) / QD

    out = {}
    for src, cs in per_src.items():
        n_s = sum(cs.values())
        js = 0.0
        for w, cw in corpus.items():
            p = cs.get(w, 0) / n_s
            qw = cw / n_tot
            m = (p + qw) / 2
            t = (0.5 * p * math.log2(p / m) if p > 0 else 0.0) + (
                0.5 * qw * math.log2(qw / m)
            )
            js += q_half_away(t)
        out[src] = (n_s, len(cs), len(corpus), round(js, 6))
    return out


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srcdiv"))
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_divergence_analytic(spark, planted_dir):
    got = {r["source"]: r for r in source_divergence(spark, planted_dir).collect()}
    want = _ref()
    assert set(got) == set(want)
    for src, (n_s, seen, total, js) in want.items():
        r = got[src]
        assert (r["n_tokens"], r["vocab_seen"], r["vocab_total"]) == (
            n_s,
            seen,
            total,
        )
        assert r["vocab_frac"] == round(seen / total, 6)
        assert r["js_div"] == pytest.approx(js, abs=2e-6)
        assert 0.0 <= r["js_div"] <= 1.0  # JS in bits is bounded by 1


def test_identical_source_has_zero_divergence(spark, tmp_path):
    """A corpus with ONE source: p == q for every token → JS exactly 0."""
    out = str(tmp_path / "one")
    spark.createDataFrame(
        [(0, "a a b c", "en", "only", 7), (1, "b c d", "en", "only", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    r = source_divergence(spark, out).collect()[0]
    assert r["js_div"] == 0.0 and r["vocab_frac"] == 1.0


def test_plan_broadcasts_catalog_sides(spark, planted_dir):
    plan = (
        source_divergence(spark, planted_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-source totals and the grand total broadcast; the grid↔counts
    # join is the only non-broadcast join and it is keyed on (source, w)
    assert plan.count("BroadcastNestedLoopJoin") == 2


def test_counts_exchange_is_reused(spark, planted_dir):
    """The per-token totals, per-source totals, and grid all consume the
    same (source, token) counts aggregate — after execution AQE must have
    deduplicated that corpus-scale subtree (ReusedExchange present), not
    re-scanned per consumer."""
    df = source_divergence(spark, planted_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
