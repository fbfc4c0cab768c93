"""Deduplication operators over `documents`.

Scale design: exact dedup is a hash groupBy (one shuffle on a 64-bit text
hash, never on the text itself); near-dup is MinHash+LSH — candidates from a
band-key self-join (shuffle on short band keys), then *exact* Jaccard
verification on the candidate pairs only. The verified output is what the
oracle checks: the O(n²) DuckDB twin computes ground-truth pairs, so any LSH
false negative (probability ≈ 6e-8 per true pair at J≥0.9 with 16×4 bands)
or false positive would surface as a mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions import textstats as ts
from ..functions.fingerprint import (
    band_keys_expr,
    minhash_sig_expr,
    shingles_expr,
    shingles_sql,
    token_hash_expr,
    token_hash_sql,
)
from . import register

JACCARD_THRESHOLD = 0.5

# ---------------------------------------------------------------------------
# Exact dedup: rank within identical-text groups. Scale shape: the ONE
# exchange is keyed on xxhash64(text) — 8 bytes/row cross the shuffle, never
# the document bytes. In-group text verification happens locally: the window
# is partitioned by (th, text), and hashpartitioning(th) already satisfies
# ClusteredDistribution([th, text]) (equal (th, text) ⇒ equal th ⇒ same
# partition), so Catalyst inserts no second exchange — two distinct texts
# colliding on the 64-bit hash still rank/count independently, they just
# land in the same shuffle partition. Asserted in tests/test_plans.py.
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS dup_rank,
           count(*) OVER (PARTITION BY text) AS group_size
    FROM documents
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").withColumn(
        "th", F.xxhash64("text")
    )
    d = d.repartition(F.col("th"))  # the only exchange: 8-byte key
    w = Window.partitionBy("th", "text")
    return d.select(
        "doc_id",
        F.row_number().over(w.orderBy("doc_id")).alias("dup_rank"),
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
    )


# ---------------------------------------------------------------------------
# Shared ground truth for near-dup pairs: exact word-3-shingle Jaccard.
# DuckDB oracle does the O(n²) self-join (fine at sf0.01); Spark must produce
# the same pairs via the scalable path.
# ---------------------------------------------------------------------------


def _jaccard_pairs_sql(threshold: float) -> str:
    sh = shingles_sql("string_split(text, ' ')")
    return f"""
    WITH d AS (SELECT doc_id, {sh} AS sh FROM documents),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
    FROM p WHERE jaccard >= {threshold}
    """


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", shingles_expr(ts.tokens_expr(F.col("text"))).alias("sh")
    )


def _verify_pairs(cands: DataFrame, shingled: DataFrame) -> DataFrame:
    """Exact Jaccard on candidate pairs; emits (doc_a, doc_b, jaccard)."""
    a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        joined.filter(jac >= JACCARD_THRESHOLD)  # filter pre-round (oracle parity)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# n-gram Jaccard near-dup, count-based and EXACT: explode each doc's
# (distinct) shingle hashes, self-join on the 8-byte hash, and count shared
# shingles per pair — |A∩B| from the groupBy, |A∪B| = |A|+|B|−|A∩B| from
# per-doc sizes. No shingle arrays in the shuffle, no array_intersect on
# candidate rows, and exact recall (any pair with J>0 shares a key), unlike
# sampled-shingle blocking (which measurably dropped pairs at sf0.1) or
# LSH (probabilistic). This is the shape that survives 10^12 docs: two
# shuffles on (int64 key) and (int64 pair), both pure hash aggregations.
# A 64-bit hash collision merging two distinct shingles perturbs a count
# with probability ~|shingles|²/2^64 — negligible, and the exact DuckDB
# oracle would catch it.
@register("dedup_ngram_jaccard", oracle=_jaccard_pairs_sql(JACCARD_THRESHOLD))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingled = _shingled(spark, sf_dir)  # sh is array_distinct per doc
    keyed = shingled.select(
        "doc_id",
        F.size("sh").alias("n"),
        F.explode(F.transform(F.col("sh"), lambda s: F.xxhash64(s))).alias("k"),
    )
    inter = (
        keyed.alias("x")
        .join(keyed.alias("y"), F.col("x.k") == F.col("y.k"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.n").alias("n_a"),
            F.col("y.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return (
        inter.filter(jac >= JACCARD_THRESHOLD)  # filter pre-round (oracle parity)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# MinHash + LSH banding: 64 minhashes, 16 bands × 4 rows; candidates =
# same band key; exact-verify. The scalable near-dup path for 10^12 docs
# (shuffle carries only (band_key, doc_id)). Signatures come from the
# vectorized numpy kernel (minhash_bands_udf) — bit-identical to the
# column-expression path (tested) and ~20× faster.
@register("dedup_minhash_lsh", oracle=_jaccard_pairs_sql(JACCARD_THRESHOLD))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.fingerprint import minhash_bands_udf

    d = read_table(spark, sf_dir, "documents")
    shingled = _shingled(spark, sf_dir)
    sig = d.select("doc_id", minhash_bands_udf(F.col("text")).alias("bands"))
    keyed = sig.select("doc_id", F.explode("bands").alias("k"))
    cands = (
        keyed.alias("x")
        .join(keyed.alias("y"), F.col("x.k") == F.col("y.k"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _verify_pairs(cands, shingled)
