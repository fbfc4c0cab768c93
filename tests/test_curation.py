"""Curation operators: paragraph dedup semantics, perplexity terciles,
source reputation (oracle twins cover exactness; these pin the invariants
an oracle diff would not explain well)."""

from __future__ import annotations

import duckdb
import pytest

from isimip_qa_spark.queries import QUERIES, load_all

load_all()


@pytest.fixture(scope="module")
def docs_pdf(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()


def _string_segments(text: str, w: int = 20) -> list[str]:
    toks = text.split(" ")
    n_segs = max(-(-len(toks) // w), 1)
    return [" ".join(toks[i * w : (i + 1) * w]) for i in range(n_segs)]


def test_dedup_paragraphs_semantics(spark, sf_dir, docs_pdf):
    got = QUERIES["dedup_paragraphs"](spark, sf_dir).toPandas()
    assert len(got) == len(docs_pdf)
    texts = dict(zip(docs_pdf["doc_id"], docs_pdf["text"]))

    # independent expected: first global occurrence (doc_id, pos) survives
    seen: set[str] = set()
    expected: dict[int, tuple[str, int, int]] = {}
    for doc_id in sorted(texts):
        segs = _string_segments(texts[doc_id])
        kept = []
        for s in segs:
            if s in seen:
                continue
            seen.add(s)
            kept.append(s)
        expected[doc_id] = (" ".join(kept), len(segs), len(segs) - len(kept))

    total_dropped = 0
    for row in got.itertuples():
        want_text, want_n, want_drop = expected[row.doc_id]
        assert row.text_deduped == want_text, row.doc_id
        assert row.n_segs == want_n and row.n_dropped == want_drop
        total_dropped += row.n_dropped
        if row.n_dropped == 0:  # untouched docs reconstruct byte-identically
            assert row.text_deduped == texts[row.doc_id]
    assert total_dropped > 0  # the corpus really contains duplicate segments


def test_ppl_terciles_invariants(spark, sf_dir, docs_pdf):
    got = QUERIES["ppl_terciles"](spark, sf_dir).toPandas()
    n_langs = docs_pdf["lang"].nunique()
    assert set(got["bucket"]) == {"head", "middle", "tail"}
    assert got.groupby("lang").size().eq(3).all() and len(got) == 3 * n_langs
    for lang, g in got.groupby("lang"):
        # ntile balance: bucket sizes differ by at most 1, sum to lang total
        sizes = g.set_index("bucket")["n_docs"]
        assert sizes.max() - sizes.min() <= 1
        assert sizes.sum() == (docs_pdf["lang"] == lang).sum()
        # rounding is monotone, so bucket ppl ranges must not invert
        b = g.set_index("bucket")
        assert b.loc["head", "max_ppl"] <= b.loc["middle", "min_ppl"]
        assert b.loc["middle", "max_ppl"] <= b.loc["tail", "min_ppl"]


def test_host_reputation_flags_below_weighted_mean(spark, sf_dir):
    got = QUERIES["host_reputation"](spark, sf_dir).toPandas()
    assert got["keep_rate"].between(0, 1).all()
    corpus = (got["n_docs"] * got["keep_rate"]).sum() / got["n_docs"].sum()
    want = got["keep_rate"] < round(corpus, 6)
    assert (got["flagged"] == want).all()
    assert got["flagged"].any() and (~got["flagged"]).any()


def test_ppl_bucket_approx_agrees_with_exact(spark, sf_dir, docs_pdf):
    """The scale path (approx_percentile thresholds, no Window) must agree
    with the exact ntile assignment on virtually every doc."""
    got = QUERIES["ppl_bucket_approx"](spark, sf_dir).toPandas()
    assert len(got) == len(docs_pdf)
    # no per-lang single-task window in the plan
    plan = QUERIES["ppl_bucket_approx"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

    # exact assignment, independently: rank by avg_logprob desc per lang
    from isimip_qa_spark.functions.perplexity import build_model, OOV_LOGPROB

    model = build_model()
    rows = []
    for r in docs_pdf.itertuples():
        toks = r.text.lower().split(" ")
        avg = sum(model.get(t, OOV_LOGPROB) for t in toks) / len(toks)
        rows.append((r.doc_id, r.lang, avg))
    import pandas as pd

    exact = pd.DataFrame(rows, columns=["doc_id", "lang", "avg_lp"])
    exact = exact.sort_values(["lang", "avg_lp", "doc_id"],
                              ascending=[True, False, True])

    def ntile3(n: int) -> list[int]:
        base, rem = divmod(n, 3)
        out = []
        for b in range(1, 4):
            out += [b] * (base + (1 if b <= rem else 0))
        return out

    exact["b"] = exact.groupby("lang")["doc_id"].transform(
        lambda s: ntile3(len(s))
    )
    exact["bucket"] = exact["b"].map({1: "head", 2: "middle", 3: "tail"})
    merged = got.merge(exact[["doc_id", "bucket"]], on="doc_id",
                       suffixes=("", "_exact"))
    agree = (merged["bucket"] == merged["bucket_exact"]).mean()
    assert agree >= 0.98, agree


def test_host_boilerplate_planted(spark, tmp_path):
    """A 20-word template shared by every doc of one host is flagged with
    frac 1.0; unique bodies and the clean host produce no rows."""
    import pandas as pd

    from isimip_qa_spark.queries.curation import SEG_W, host_boilerplate

    template = " ".join(f"nav{i}" for i in range(SEG_W))
    docs = []
    for i in range(5):
        body = " ".join(f"body{i}w{j}" for j in range(SEG_W))
        docs.append((i, f"{template} {body}", "en", "hostA", 0))
    for i in range(5, 8):
        docs.append((i, " ".join(f"clean{i}w{j}" for j in range(SEG_W)),
                     "en", "hostB", 0))
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")

    rows = host_boilerplate(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["source"] == "hostA"
    assert r["segment"] == template
    assert r["n_docs_with_seg"] == 5 and r["host_docs"] == 5
    assert r["frac"] == 1.0


def test_strip_boilerplate_planted(spark, tmp_path):
    """The planted template is removed from EVERY doc of the host (byte
    reconstruction of the remaining body); clean docs are untouched."""
    import pandas as pd

    from isimip_qa_spark.queries.curation import SEG_W, strip_boilerplate

    template = " ".join(f"nav{i}" for i in range(SEG_W))
    docs, bodies = [], {}
    for i in range(4):
        body = " ".join(f"body{i}w{j}" for j in range(SEG_W))
        bodies[i] = body
        docs.append((i, f"{template} {body}", "en", "hostA", 0))
    clean_text = " ".join(f"clean{j}" for j in range(SEG_W))
    docs.append((9, clean_text, "en", "hostB", 0))
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")

    got = {r["doc_id"]: r for r in strip_boilerplate(spark, str(tmp_path)).collect()}
    for i in range(4):
        assert got[i]["text_clean"] == bodies[i]
        assert got[i]["n_stripped"] == 1 and got[i]["n_segs"] == 2
    assert got[9]["text_clean"] == clean_text
    assert got[9]["n_stripped"] == 0


def test_ppl_bucket_agreement_row(spark, sf_dir, docs_pdf):
    """The driver-visible companion row: full population, boolean bar
    cleared, exactly one row (the per-doc >=98% strength lives in
    test_ppl_bucket_approx_agrees_with_exact above)."""
    got = QUERIES["ppl_bucket_agreement"](spark, sf_dir).toPandas()
    assert len(got) == 1
    assert int(got["n_docs"].iloc[0]) == len(docs_pdf)
    assert bool(got["agreement_ok"].iloc[0]) is True
