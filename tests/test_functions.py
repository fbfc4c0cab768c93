"""Backend-equivalence tests: the pandas-UDF production paths must produce
exactly what the pure-column-expression twins produce (SURVEY.md §5's
golden-artifact mechanism applied to function backends)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_langid_udf_equals_expr(spark, pages_sdf):
    from isimip_qa_spark.functions.langid import lang_pred_expr, lang_pred_udf

    df = pages_sdf.select(
        "url",
        lang_pred_udf(F.col("text")).alias("udf"),
        lang_pred_expr(F.col("text")).alias("expr"),
    )
    mismatches = df.filter(F.col("udf") != F.col("expr")).count()
    assert mismatches == 0


def test_scrub_udf_equals_expr_on_portable_patterns(spark, pages_sdf):
    """Java-regex expr backend vs Python-re UDF backend — identical on the
    engine-portable pattern subset (scrub.py contract)."""
    from isimip_qa_spark.functions.scrub import scrub_expr, scrub_udf

    df = pages_sdf.select(
        scrub_udf(F.col("text")).alias("py"),
        scrub_expr(F.col("text")).alias("jvm"),
    )
    assert df.filter(F.col("py") != F.col("jvm")).count() == 0


def test_scrub_known_pii():
    from isimip_qa_spark.functions.scrub import _scrub_series

    s = pd.Series(
        [
            "mail a.b@c.org now",
            "call +1 (555) 123-4567 ok",
            "ip 10.0.0.1 end",
            "clean text",
        ]
    )
    got = _scrub_series(s).tolist()
    assert got == [
        "mail <EMAIL> now",
        "call <PHONE> ok",
        "ip <IP> end",
        "clean text",
    ]


def test_perplexity_dyadic_exactness():
    """avg_logprob is an exact dyadic mean: udf output == direct fsum."""
    import math

    from isimip_qa_spark.functions.perplexity import (
        MODEL, OOV_LOGPROB, _score_series,
    )

    texts = pd.Series(["the stream of data", "zzz qqq", "质量 过滤"])
    got = _score_series(texts)
    for t, row in zip(texts, got.itertuples(index=False)):
        toks = t.lower().split(" ")
        want = math.fsum(MODEL.get(w, OOV_LOGPROB) for w in toks) / len(toks)
        assert row.avg_logprob == want  # exact, not approx


def test_histogram_matches_numpy(spark, sf_dir):
    """The 2-pass histogram == np.histogram with 101 linspace edges (the
    reference's binning, histogram.py:37-59)."""
    from isimip_qa_spark.queries.reference_ops import histogram

    got = histogram(spark, sf_dir).toPandas().sort_values("bin")
    vals = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_extendedprice")
        .toPandas()["l_extendedprice"]
        .to_numpy()
    )
    counts, _ = np.histogram(vals, bins=np.linspace(vals.min(), vals.max(), 101))
    assert got["cnt"].tolist() == counts.tolist()


def test_minhash_jaccard_recall(pages_pdf):
    """MinHash signatures of the planted near-dup pairs collide in ≥1 band."""
    from isimip_qa_spark.functions.fingerprint import (
        LSH_BANDS, LSH_ROWS, MINHASH_COEFFS, MERSENNE31,
    )

    def shingles(t):
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
        }

    def tok_hash(s):
        return (
            len(s) * 2654435761 + ord(s[0]) * 40503 + ord(s[-1])
        ) % (2**31)

    def sig(t):
        hs = [tok_hash(s) for s in shingles(t)]
        return [
            min((h * a + b) % MERSENNE31 for h in hs) for a, b in MINHASH_COEFFS
        ]

    hit = 0
    pairs = [(i - 1, i) for i in range(97, 2000, 100)]
    for a, b in pairs:
        sa, sb = sig(pages_pdf["text"][a]), sig(pages_pdf["text"][b])
        bands = any(
            sa[i * LSH_ROWS : (i + 1) * LSH_ROWS] == sb[i * LSH_ROWS : (i + 1) * LSH_ROWS]
            for i in range(LSH_BANDS)
        )
        hit += bands
    assert hit == len(pairs)


def test_fused_equals_unfused(spark, pages_sdf):
    """The fused single-UDF path == the three individual stages, exactly."""
    from isimip_qa_spark.plans.config import QAConfig
    from isimip_qa_spark.plans.pipeline import apply_stages

    cfg = QAConfig()
    sample = pages_sdf.limit(300)
    fused = apply_stages(sample, cfg, fused=True).toPandas().sort_values("url")
    plain = apply_stages(sample, cfg, fused=False).toPandas().sort_values("url")
    for col in [
        "lang_pred", "avg_logprob", "ppl", "text_scrubbed", "keep", "scrubbed",
        "dup_line_frac", "dup_para_frac", "dup_2gram_frac",
        "repl_n", "mojibake_n", "ctrl_frac",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
    ]:
        assert fused[col].tolist() == plain[col].tolist(), col


def test_minhash_udf_equals_expr(spark, pages_sdf):
    """Vectorized numpy minhash band keys == column-expression band keys."""
    from pyspark.sql import functions as F

    from isimip_qa_spark.functions.fingerprint import (
        band_keys_expr,
        minhash_bands_udf,
        minhash_sig_expr,
        shingles_expr,
        token_hash_expr,
    )

    sample = pages_sdf.limit(100)
    expr_side = sample.select(
        "url",
        band_keys_expr(
            minhash_sig_expr(
                F.transform(shingles_expr(F.split("text", " ")), token_hash_expr)
            )
        ).alias("e"),
    )
    udf_side = sample.select("url", minhash_bands_udf(F.col("text")).alias("u"))
    j = expr_side.join(udf_side, "url")
    assert j.filter(F.col("e") != F.col("u")).count() == 0



def test_simhash_kernel_equals_expr(spark, pages_sdf):
    """Vectorized numpy simhash == the fold-expression simhash, at both the
    default width and the dedup width."""
    from pyspark.sql import functions as F

    from isimip_qa_spark.functions import textstats as ts
    from isimip_qa_spark.functions.fingerprint import simhash_expr, simhash_udf

    sample = pages_sdf.limit(150)
    for bits in (16, 28):
        j = sample.select(
            simhash_expr(ts.tokens_expr(F.col("text")), bits).alias("e"),
            simhash_udf(F.col("text"), bits).alias("u"),
        )
        assert j.filter(F.col("e") != F.col("u")).count() == 0, bits
