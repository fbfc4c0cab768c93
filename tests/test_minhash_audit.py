"""minhash_est_audit — signature-estimate vs exact Jaccard per candidate.

A pure-Python third implementation (same universal-hash family, same
portable token hash) recomputes signatures, band keys, candidates, the
estimate, and the exact Jaccard for a planted corpus: a high-overlap pair
(near-dup), a medium-overlap pair, and unique filler. Asserts the Spark
output matches the Python golden exactly (not statistically — the
estimator is deterministic for fixed coefficients), and that the audit's
candidate set contains every pair dedup_minhash_lsh verifies."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from isimip_qa_spark.functions.fingerprint import (
    KNUTH,
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE31,
    MINHASH_COEFFS,
    MOD31,
    N_MINHASH,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(words):
    return " ".join(words)


DOCS = {
    # 12-token docs sharing a 10-token prefix: J = 2/3, lands in a shared
    # band under the committed coefficients (verified by the golden below)
    0: _doc(WORDS + ["uno", "dos"]),
    1: _doc(WORDS + ["tre", "qua"]),
    # medium overlap (J ~ 0.27): correctly NOT a banding candidate — the
    # audit covers the pairs the pipeline adjudicates, by design
    2: _doc(WORDS[:6] + ["red", "green", "blue", "cyan"]),
    3: _doc(WORDS[:6] + ["ant", "bee", "cat", "dog"]),
    # unique filler
    4: _doc(["k%d" % i for i in range(10)]),
}


def _token_hash(tok: str) -> int:
    first = ord(tok[0]) if tok else 0
    last = ord(tok[-1]) if tok else 0
    return (len(tok) * 2654435761 + first * 40503 + last) % (2**31)


def _shingle_hashes(text: str, k: int = 3) -> list[int]:
    toks = text.split(" ")
    n = len(toks)
    shingles = {
        " ".join(toks[i : i + k]) for i in range(max(n - k, 0) + 1)
    }
    return sorted({_token_hash(s) for s in shingles})


def _sig(shs: list[int]) -> list[int]:
    return [
        min((h * a + b) % MERSENNE31 for h in shs) for a, b in MINHASH_COEFFS
    ]


def _band_keys(sig: list[int]) -> list[int]:
    keys = []
    for band in range(LSH_BANDS):
        k = band
        for r in range(LSH_ROWS):
            k = (k * KNUTH + sig[band * LSH_ROWS + r]) % MOD31
        keys.append(k + band * MOD31)
    return keys


def _python_golden():
    shs = {d: _shingle_hashes(t) for d, t in DOCS.items()}
    sigs = {d: _sig(s) for d, s in shs.items()}
    keys = {d: set(_band_keys(s)) for d, s in sigs.items()}
    rows = {}
    ids = sorted(DOCS)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not keys[a] & keys[b]:
                continue
            agree = sum(x == y for x, y in zip(sigs[a], sigs[b]))
            est = agree / N_MINHASH
            sa, sb = set(shs[a]), set(shs[b])
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            rows[(a, b)] = (
                round(est, 6),
                round(jac, 6),
                round(abs(est - jac), 6),
            )
    return rows


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("auditdocs"))
    ids = sorted(DOCS)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([DOCS[i] for i in ids], pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["t"] * len(ids), pa.string()),
            "n_chars": pa.array([len(DOCS[i]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(table, f"{d}/documents.parquet")
    return d


def test_audit_matches_python_golden(spark, docs_dir):
    from isimip_qa_spark.queries.dedup import minhash_est_audit

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["est_jaccard"],
            r["jaccard"],
            r["abs_err"],
        )
        for r in minhash_est_audit(spark, docs_dir).collect()
    }
    want = _python_golden()
    assert got == want
    # the plant must actually exercise the audit: the near-dup pair is a
    # candidate and its estimate tracks the exact value
    assert (0, 1) in want
    est, jac, err = want[(0, 1)]
    assert jac > 0.5 and err < 0.25
    # the medium-overlap pair is below the banding threshold — not audited
    assert (2, 3) not in want


def test_audit_kernel_equals_expression_path(spark, docs_dir):
    """The Arrow kernel (minhash_audit_series) must be bit-identical to
    the expression path minhash_sig_expr over hashed shingles, and its
    distinct shingle-hash sets must equal the expression path's — the same
    float/int-parity discipline as the band-key kernel."""
    from pyspark.sql import functions as F

    from isimip_qa_spark.functions import textstats as ts
    from isimip_qa_spark.functions.fingerprint import (
        minhash_audit_udf,
        minhash_sig_expr,
        shingles_expr,
        token_hash_expr,
    )

    d = spark.read.parquet(f"{docs_dir}/documents.parquet")
    shs_expr = F.array_sort(
        F.array_distinct(
            F.transform(
                shingles_expr(ts.tokens_expr(F.col("text"))),
                token_hash_expr,
            )
        )
    )
    j = d.select(
        "doc_id",
        minhash_audit_udf(F.col("text")).alias("m"),
        shs_expr.alias("e_shs"),
        minhash_sig_expr(shs_expr).alias("e_sig"),
    )
    bad = j.filter(
        (F.col("m.sig") != F.col("e_sig")) | (F.col("m.shs") != F.col("e_shs"))
    )
    assert bad.count() == 0


def test_audit_plan_python_is_only_the_arrow_kernel(spark, docs_dir):
    """The only Python in the plan is the Arrow signature kernel —
    candidates, band folds, agreement count, and the exact Jaccard all
    stay JVM-side (the audit must not reintroduce the expression-path
    regression it was rewritten to avoid). The kernel prints once per
    consumer branch of the memoized frame until the lazy localCheckpoint
    materializes (then branches read Scan ExistingRDD), so the lock is on
    the KIND of Python node, with a branch-count cap."""
    from isimip_qa_spark.queries.dedup import minhash_est_audit

    df = minhash_est_audit(spark, docs_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python ever
    arrow_nodes = [
        line for line in plan.splitlines() if "ArrowEvalPython" in line
    ]
    assert len(arrow_nodes) <= 3, plan  # one kernel, <= one per branch
    for line in arrow_nodes:
        assert "minhash_audit_series" in line, line  # only THE kernel


def test_audit_candidates_cover_verified_pairs(spark, sf_dir):
    from isimip_qa_spark.queries.dedup import (
        dedup_minhash_lsh,
        minhash_est_audit,
    )

    audited = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_est_audit(spark, sf_dir).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert verified <= audited
    assert len(audited) > 0
