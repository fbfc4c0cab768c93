"""Deduplication operators over `documents`.

Scale design: exact dedup is a hash groupBy (one shuffle on a 64-bit text
hash, never on the text itself); near-dup is MinHash+LSH — candidates from a
band-key self-join (shuffle on short band keys), then *exact* Jaccard
verification on the candidate pairs only. The verified output is what the
oracle checks: the O(n²) DuckDB twin computes ground-truth pairs, so any LSH
false negative (probability ≈ 6e-8 per true pair at J≥0.9 with 16×4 bands)
or false positive would surface as a mismatch.

Mass-duplicate guard (the crawl pathology: 10⁶ byte-identical empty /
boilerplate pages sharing every blocking key → k² candidate rows):

1. EVERY near-dup query runs over exact-duplicate REPRESENTATIVES (min
   doc_id per identical text) — the composed-pipeline contract "dedup_exact
   first". A byte-identical cluster of any size contributes ONE doc to
   blocking; its members are already reported by `dedup_exact` (dup_rank /
   group_size). The representative selection is one map-side-combining
   hash-agg exchange (exact_reps) and is mirrored EXACTLY in each DuckDB
   oracle (a min(doc_id)-per-text CTE), so the contract is oracle-enforced,
   not advisory.
2. Residual near-identical-but-distinct clusters are bounded by a blocking
   key frequency cap (`cap_hot_keys`, BUCKET_CAP): keys shared by more than
   BUCKET_CAP representatives are dropped before the self-join, bounding
   per-key fan-out at BUCKET_CAP². Recall contract: a pair is missed only
   if EVERY key it shares is hot — i.e. it sits inside a > BUCKET_CAP
   near-identical cluster, where pair enumeration is quadratic by
   definition and clustering (connected components over the surviving
   pairs) is the right output. The cap is inert at tested scales
   (asserted in tests/test_dedup_caps.py), so the oracles — which do not
   model the cap — remain exact.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions import textstats as ts
from ..functions.fingerprint import (
    fnv64_sql,
    shingles_expr,
    shingles_sql,
    simhash64_from_hashes_sql,
    simhash_sql,
)
from . import register
from ._util import spread

JACCARD_THRESHOLD = 0.5
BUCKET_CAP = 256  # blocking-key document-frequency cap (see module docstring)

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


# Exact-duplicate representatives: min doc_id per identical text — the
# "dedup_exact first" composition every near-dup query below builds on.
# The oracle twin is `_REPS_CTE`.
_REPS_CTE = (
    "reps AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text)"
)


def exact_reps(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """min-id representative per identical text (DataFrame-level core, so
    planted-cluster tests can drive it directly).

    Shape: ONE hash-agg exchange on (xxhash64(text), text) with map-side
    partial aggregation — a mass-duplicate cluster collapses to one row per
    upstream partition BEFORE the shuffle, so the exchange never carries a
    cluster's full k rows. No sort, no window (a groupBy min beats a
    row_number window here: same distribution requirement, no ordering)."""
    d = docs.withColumn("_th", F.xxhash64(text_col))
    return (
        d.groupBy("_th", text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, text_col)
    )


def rep_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_reps(read_table(spark, sf_dir, "documents"))


def cap_hot_keys(keyed: DataFrame, key: str = "k", cap: int = BUCKET_CAP) -> DataFrame:
    """Drop blocking keys whose frequency exceeds `cap` before a candidate
    self-join (the DF-cap discipline from the shingle join, applied to every
    LSH family member). Formulated as a count-window over the key: the
    window's exchange is the SAME hashpartitioning(key) the self-join needs,
    so the cap costs zero extra shuffles (both join sides reuse the one
    exchange), and no frequency table is ever materialised — at 10^12 rows
    a separate groupBy-freq + anti-join would itself be a full-size
    aggregation. Recall contract in the module docstring."""
    w = Window.partitionBy(key)
    return (
        keyed.withColumn("_f", F.count(F.lit(1)).over(w))
        .filter(F.col("_f") <= cap)
        .drop("_f")
    )


def candidate_pairs(keyed: DataFrame, id_col: str, key: str = "k",
                    cap: int = BUCKET_CAP) -> DataFrame:
    """(id, blocking key) → distinct candidate (a < b) pairs, hot keys
    capped. The shared candidate step of minhash / simhash / multiprobe
    (tests/test_dedup_caps.py drives it directly with planted clusters)."""
    kept = cap_hot_keys(keyed, key, cap)
    return (
        kept.alias("x")
        .join(kept.alias("y"), F.col(f"x.{key}") == F.col(f"y.{key}"))
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias(f"{id_col}_a"),
            F.col(f"y.{id_col}").alias(f"{id_col}_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Shared ground truth for near-dup pairs: exact word-3-shingle Jaccard over
# representatives. DuckDB oracle does the O(n²) self-join (fine at sf0.01);
# Spark must produce the same pairs via the scalable path.
# ---------------------------------------------------------------------------


def _jaccard_pairs_sql(threshold: float) -> str:
    sh = shingles_sql("string_split(text, ' ')")
    return f"""
    WITH {_REPS_CTE},
    d AS (SELECT doc_id, {sh} AS sh FROM reps),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
    FROM p WHERE jaccard >= {threshold}
    """


def _shingled_of(reps: DataFrame) -> DataFrame:
    # no spread: the reps groupBy exchange already distributes the rows
    return reps.select(
        "doc_id", shingles_expr(ts.tokens_expr(F.col("text"))).alias("sh")
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shingled_of(rep_documents(spark, sf_dir))


DF_CAP = 64  # stop-shingle cut: drop shingles appearing in > DF_CAP docs


def _jaccard_pairs_capped_sql(threshold: float, cap: int) -> str:
    """DuckDB twin of the DF-capped path — the cap is applied identically
    (drop shingles with document frequency > cap; per-doc sizes recomputed
    over kept shingles), so Spark and oracle stay exact twins.
    tests/test_dedup_caps.py asserts this equals the UNCAPPED ground truth
    at test scale (max df ≤ cap there), so a fixture change that makes the
    cap bite fails loudly instead of silently redefining the query."""
    sh = shingles_sql("string_split(text, ' ')")
    return f"""
    WITH {_REPS_CTE},
    d AS (SELECT doc_id, {sh} AS sh FROM reps),
    e AS (SELECT doc_id, unnest(sh) AS s FROM d),
    keep_s AS (SELECT s FROM (SELECT s, count(*) AS c FROM e GROUP BY s)
               WHERE c <= {cap}),
    kept AS (SELECT e.doc_id, e.s FROM e JOIN keep_s USING (s)),
    sz AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    p AS (SELECT doc_a, doc_b,
                 inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
          FROM i JOIN sz sa ON sa.doc_id = i.doc_a
                 JOIN sz sb ON sb.doc_id = i.doc_b)
    SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
    FROM p WHERE jaccard >= {threshold}
    """


# n-gram Jaccard near-dup, count-based: explode each doc's (distinct)
# shingle hashes, self-join on the 8-byte hash, and count shared shingles
# per pair — |A∩B| from the groupBy, |A∪B| = |A|+|B|−|A∩B| from per-doc
# sizes. No shingle arrays in the shuffle, no array_intersect on candidate
# rows.
#
# Scale guard — stop-shingle DF cap: a shingle shared by m docs emits m²
# join rows pre-aggregation, so without a cap a boilerplate 3-gram ("all
# rights reserved") that appears in a large fraction of a crawl makes the
# self-join quadratic. Shingles with document frequency > DF_CAP are
# dropped before the join (standard DF-cap for blocking keys), bounding the
# per-key fan-out at DF_CAP². Recall contract: Jaccard is then measured
# over *informative* shingles only — a pair is missed only if every shingle
# it shares is boilerplate (df > DF_CAP); for such pairs the MinHash-LSH
# path below remains the detector. At the tested scales the cap is inert
# (max df at sf0.01 is 7), so the oracle — which applies the identical cap
# — also equals the uncapped ground truth there (asserted in
# tests/test_dedup_caps.py).
#
# Cost shape at 10^12 docs: one hash agg on int64 keys for the df table, a
# broadcast anti-join against the (tiny-by-construction) stop-shingle set,
# one 8-byte-key window exchange for per-doc sizes, then the bounded
# self-join + pair hash agg. A 64-bit hash collision merging two shingles
# perturbs a count with probability ~|shingles|²/2^64 — negligible, and the
# exact DuckDB oracle would catch it.
@register(
    "dedup_ngram_jaccard",
    oracle=_jaccard_pairs_capped_sql(JACCARD_THRESHOLD, DF_CAP),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingled = _shingled(spark, sf_dir)  # sh is array_distinct per doc
    keyed = shingled.select(
        "doc_id",
        F.explode(F.transform(F.col("sh"), lambda s: F.xxhash64(s))).alias("k"),
    )
    # DF cap via frequency table + broadcast anti-join (NOT the window cap
    # used for the band/chunk/bucket keys): shingle keys are high-cardinality
    # (~|corpus shingles| distinct), so a count-window over k would sort the
    # whole exploded table, while the hot-shingle set stays tiny (boilerplate
    # n-grams only) and broadcasts. Measured 2-3× faster here; the window cap
    # wins for the LOW-cardinality LSH blocking keys where the join reuses
    # its exchange.
    dfreq = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("df"))
    hot = dfreq.filter(F.col("df") > DF_CAP).select("k")
    kept = keyed.join(F.broadcast(hot), "k", "left_anti")
    kept = kept.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    inter = (
        kept.alias("x")
        .join(kept.alias("y"), F.col("x.k") == F.col("y.k"))
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
# (the candidate shuffle carries only (band_key, doc_id)). Band keys come
# from the vectorized numpy kernel (minhash_bands_udf) — bit-identical to
# the column-expression path (tested) and ~20× faster. Verification joins
# ship each candidate doc's DISTINCT xxhash64(shingle) set — compact int64
# arrays (~8 bytes/shingle) instead of shingle strings, and
# array_intersect compares longs. Jaccard over 64-bit hash sets equals
# Jaccard over shingle-string sets modulo ~|shingles|²/2^64 collisions —
# the same accepted tolerance as dedup_ngram_jaccard, and the exact DuckDB
# oracle (O(n²) string Jaccard) verifies it holds. (A 31-bit structural
# token hash was tried here and REJECTED: same-(length,first,last) shingles
# collide often enough to shift set cardinalities and fail the oracle.)
def _minhash_pairs(reps: DataFrame) -> DataFrame:
    """Verified near-dup pairs (doc_a, doc_b, jaccard) over representatives
    — the LSH-candidates + exact-verify core shared by dedup_minhash_lsh
    and dedup_clusters."""
    from ..functions.fingerprint import minhash_bands_udf

    # ONE representative subplan feeds both branches (signatures + shingle
    # sets): identical canonical subtrees, so the reps exchange is computed
    # once and reused (ReusedExchange), not run per branch
    sig = reps.select("doc_id", minhash_bands_udf(F.col("text")).alias("bands"))
    sh64 = _shingled_of(reps).select(
        "doc_id",
        F.array_sort(
            F.array_distinct(F.transform(F.col("sh"), lambda s: F.xxhash64(s)))
        ).alias("sh"),
    )
    keyed = sig.select("doc_id", F.explode("bands").alias("k"))
    cands = candidate_pairs(keyed, "doc_id")
    a = sh64.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    b = sh64.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "doc_id_a").join(b, "doc_id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = inter / union
    return joined.filter(jac >= JACCARD_THRESHOLD).select(
        F.col("doc_id_a").alias("doc_a"),
        F.col("doc_id_b").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )


@register("dedup_minhash_lsh", oracle=_jaccard_pairs_sql(JACCARD_THRESHOLD))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs(rep_documents(spark, sf_dir))


# ---------------------------------------------------------------------------
# Cluster assignment: near-dup pairs are only half a dedup pipeline —
# similarity is not transitive (A~B, B~C, A≁C), so keep/drop needs the
# CONNECTED COMPONENT, not the pair list. dedup_clusters composes the full
# chain: exact reps → minhash-verified pairs → large-star/small-star
# components (operators/components.py) → every document labeled with its
# cluster id (the minimum doc_id reachable through exact or near duplicate
# links); a trainer keeps exactly the docs where doc_id == cluster_id.
# The DuckDB twin computes ground truth with a recursive transitive-closure
# CTE over the exact O(n²) Jaccard pairs — it verifies BOTH the LSH recall
# and the component labels.
# ---------------------------------------------------------------------------


def _clusters_sql(threshold: float) -> str:
    sh = shingles_sql("string_split(text, ' ')")
    return f"""
    WITH RECURSIVE {_REPS_CTE},
    d AS (SELECT doc_id, {sh} AS sh FROM reps),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / len(list_distinct(list_concat(a.sh, b.sh))) >= {threshold}
    ),
    e AS (SELECT doc_a AS a, doc_b AS b FROM p
          UNION SELECT doc_b, doc_a FROM p),
    r(a, b) AS (
      SELECT a, a FROM (SELECT a FROM e UNION SELECT b FROM e)
      UNION
      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
    ),
    comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM r GROUP BY a)
    SELECT doc0.doc_id,
           coalesce(comp.cluster_id, reps.doc_id) AS cluster_id
    FROM documents doc0
    JOIN reps ON reps.text = doc0.text
    LEFT JOIN comp ON comp.doc_id = reps.doc_id
    """


@register("dedup_clusters", oracle=_clusters_sql(JACCARD_THRESHOLD))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    docs = read_table(spark, sf_dir, "documents")
    reps = exact_reps(docs)
    pairs = _minhash_pairs(reps)
    comp = connected_components(pairs, "doc_a", "doc_b")
    # exact-dup members inherit their representative's component; reps in
    # no near-dup pair are their own cluster. The member→rep join must
    # match on text itself (a 64-bit hash-only join would merge colliding
    # distinct texts — the same collision discipline dedup_exact keeps), so
    # like exact_reps it pays exactly one text-keyed exchange.
    rep_of = docs.select("doc_id", "text").join(
        reps.select(F.col("doc_id").alias("rep"), "text"), "text"
    ).drop("text")
    return (
        rep_of.join(comp, rep_of["rep"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("rep")).alias("cluster_id"),
        )
    )


# (SparkContext applicationId, canonical table dir, table stat token) ->
# materialized assignment. LRU-capped: evicting an entry drops the only
# strong reference to its checkpointed frame, re-enabling ContextCleaner
# block cleanup (the graph.py release discipline) for corpora a sweep has
# moved past.
_ASSIGNMENT_MEMO: "OrderedDict[tuple[str, str, str], DataFrame]" = (
    OrderedDict()
)
_ASSIGNMENT_LOCK = threading.Lock()
_ASSIGNMENT_CAP = 8


def _table_token(sf_dir: str) -> str:
    """Best-effort freshness token for the documents table: mtime+size of
    the parquet file (or of the directory, whose mtime changes when Spark
    rewrites its part files). Overwriting the table under a memoised path
    therefore invalidates the entry instead of serving stale clusters."""
    p = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(p)
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "unknown"


def cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialise-once face of dedup_clusters: computed one time per
    (SparkContext, table) and pinned with an eager localCheckpoint, then
    handed to every downstream consumer (keep-best argmax, cluster-size
    histogram, repeat weights) so none of them re-runs the minhash-pair +
    connected-components lineage. This is the in-process stand-in for the
    production step that writes the assignment to its own table once —
    (doc_id, cluster_id) is 16 bytes/row, the same footprint discipline as
    the CC iteration's own per-round checkpoints. The memo key carries a
    table stat token, so rewriting the table at `sf_dir` invalidates the
    entry rather than serving stale clusters; localCheckpoint is
    executor-local, so the production path at cluster scale is the real
    table write this stands in for. `dedup_clusters` itself stays pure
    (its registered query/oracle measures the real chain)."""
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        _table_token(sf_dir),
    )
    with _ASSIGNMENT_LOCK:
        df = _ASSIGNMENT_MEMO.get(key)
        if df is not None:
            _ASSIGNMENT_MEMO.move_to_end(key)
            return df
    # materialise outside the lock (minutes-long at scale); a concurrent
    # first caller may race and compute twice — correctness is unaffected
    # and the loser's frame is dropped to GC when the dict slot is taken
    df = dedup_clusters(spark, sf_dir).localCheckpoint(eager=True)
    with _ASSIGNMENT_LOCK:
        won = _ASSIGNMENT_MEMO.setdefault(key, df)
        while len(_ASSIGNMENT_MEMO) > _ASSIGNMENT_CAP:
            _ASSIGNMENT_MEMO.popitem(last=False)
    return won


# ---------------------------------------------------------------------------
# SimHash near-dup pairs via banded Hamming blocking — PIGEONHOLE-EXACT:
# with the fingerprint split into C chunks, two fingerprints at Hamming
# distance ≤ C-1 must agree on at least one whole chunk, so "candidates =
# pairs sharing any chunk value" has 100% recall for d ≤ C-1 by
# construction (not probabilistically, unlike MinHash bands) — among
# representatives with no hot chunk key (module docstring).
#
# Two widths share this plan (explode C 8-byte chunk keys, hash self-join,
# distinct, integer-verify):
# - dedup_simhash: 28-bit demo fingerprint, 2×14-bit chunks, d ≤ 1. The
#   31-bit structural token hash keeps it reproducible by integer SQL; kept
#   as the legacy-twin query.
# - dedup_simhash64: the PRODUCTION shape — 64-bit fingerprint over
#   FNV-1a-64 token hashes, 4×16-bit chunks, d ≤ 3. Average bucket
#   occupancy n/65,536 per chunk table, and the DuckDB oracle reproduces
#   the full fingerprint with HUGEINT arithmetic, so the O(n²)
#   bit_count(xor) ground truth still verifies it exactly.
# ---------------------------------------------------------------------------

SIMHASH_DEDUP_BITS = 28
SIMHASH_CHUNKS = 2
_CHUNK_BITS = SIMHASH_DEDUP_BITS // SIMHASH_CHUNKS
SIMHASH_HAMMING_MAX = SIMHASH_CHUNKS - 1


def _chunk_keys(sh: Column, n_chunks: int, chunk_bits: int) -> Column:
    """Chunk-disjoint blocking keys from a fingerprint column. shiftright on
    BIGINT is arithmetic, so mask AFTER shifting — correct for negative
    (64-bit two's-complement) fingerprints too."""
    return F.array(
        *[
            F.shiftright(sh, chunk_bits * i)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            + F.lit((i + 1) << (chunk_bits + 1)).cast("long")
            for i in range(n_chunks)
        ]
    )


def _simhash_pairs(sig: DataFrame, n_chunks: int, chunk_bits: int,
                   hamming_max: int) -> DataFrame:
    """sig(doc_id, sh) → verified pairs at Hamming ≤ hamming_max.

    The repartition below is a deliberate materialisation barrier: the sig
    subtree (scan + fingerprint kernel) feeds THREE plan branches (the
    candidate keys and both verify sides); an Exchange node directly above
    it is canonically identical in all three, so adaptive execution reuses
    the shuffle stage at runtime and the other branches read the 16-byte
    (doc_id, sh) rows instead of re-scanning + re-hashing the corpus
    (measured ~3x on this query vs the barrier-free plan; a persist() of
    the sig table was also tried and measured slower at bench scale)."""
    sig = sig.repartition(F.col("doc_id"))
    keyed = sig.select(
        "doc_id", F.explode(_chunk_keys(F.col("sh"), n_chunks, chunk_bits)).alias("k")
    )
    cands = candidate_pairs(keyed, "doc_id")
    a = sig.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    b = sig.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        cands.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .filter(ham <= hamming_max)
        .select(
            F.col("doc_id_a").alias("doc_a"),
            F.col("doc_id_b").alias("doc_b"),
            ham.alias("hamming"),
        )
    )


def _simhash_chunk_keys_sql(n_chunks: int, chunk_bits: int) -> str:
    """DuckDB twin of _chunk_keys over a column named `sh`."""
    mask = (1 << chunk_bits) - 1
    terms = [
        f"((sh >> {chunk_bits * i}) & {mask}) + {(i + 1) << (chunk_bits + 1)}"
        for i in range(n_chunks)
    ]
    return "[" + ", ".join(terms) + "]"


# The demo-width (28-bit) simhash twin applies the IDENTICAL
# blocking-key frequency cap as the engine (cap_hot_keys) — at sf0.1 the
# fixture's template clusters push one 14-bit chunk key to 261 > 256
# docs, so the cap is LIVE there by construction of the demo width and an
# uncapped ground-truth twin would (correctly) report the bounded recall
# as a mismatch (found by the round-4 cross-sf run). The production-width
# dedup_simhash64 below keeps the UNCAPPED O(n²) ground-truth twin: its
# 16-bit chunks over a 64-bit fingerprint keep every key far below the
# cap at tested scales, so the oracle still proves the cap inert there —
# the same split of roles as _jaccard_pairs_capped_sql vs
# _jaccard_pairs_sql for the shingle DF cap.
@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_REPS_CTE},
    d AS (
      SELECT doc_id,
             {simhash_sql('string_split(text, ' + chr(39) + ' ' + chr(39) + ')', SIMHASH_DEDUP_BITS)} AS sh
      FROM reps
    ),
    k AS (SELECT doc_id,
                 unnest({_simhash_chunk_keys_sql(SIMHASH_CHUNKS, _CHUNK_BITS)}) AS k
          FROM d),
    kc AS (SELECT doc_id, k FROM (
             SELECT doc_id, k, count(*) OVER (PARTITION BY k) AS f FROM k)
           WHERE f <= {BUCKET_CAP}),
    c AS (SELECT DISTINCT a.doc_id AS d_a, b.doc_id AS d_b
          FROM kc a JOIN kc b ON a.k = b.k AND a.doc_id < b.doc_id)
    SELECT c.d_a AS doc_a, c.d_b AS doc_b,
           CAST(bit_count(xor(da.sh, db.sh)) AS BIGINT) AS hamming
    FROM c JOIN d da ON da.doc_id = c.d_a JOIN d db ON db.doc_id = c.d_b
    WHERE bit_count(xor(da.sh, db.sh)) <= {SIMHASH_HAMMING_MAX}
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.fingerprint import simhash_udf

    d = rep_documents(spark, sf_dir)
    # vectorized numpy kernel — bit-identical to
    # simhash_expr(ts.tokens_expr(text), bits) (tested), ~10× the
    # interpreted 28-fold expression path that this query evaluates on
    # three plan branches (keyed + both verify sides)
    sig = d.select(
        "doc_id", simhash_udf(F.col("text"), SIMHASH_DEDUP_BITS).alias("sh")
    )
    return _simhash_pairs(sig, SIMHASH_CHUNKS, _CHUNK_BITS, SIMHASH_HAMMING_MAX)


SIMHASH64_CHUNKS = 4
SIMHASH64_CHUNK_BITS = 16
SIMHASH64_HAMMING_MAX = SIMHASH64_CHUNKS - 1  # d ≤ 3, pigeonhole-exact


@register(
    "dedup_simhash64",
    oracle=f"""
    WITH {_REPS_CTE},
    th AS (SELECT doc_id,
                  list_transform(string_split(text, ' '), t -> {fnv64_sql('t')}) AS h
           FROM reps),
    d AS (SELECT doc_id, {simhash64_from_hashes_sql('h')} AS sh FROM th)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= {SIMHASH64_HAMMING_MAX}
    """,
)
def dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-width simhash near-dup pairs (64-bit, 4×16-bit chunks).

    The engine path is the vectorized FNV-1a-64 kernel
    (functions/fingerprint.py:simhash64_series); the oracle rebuilds the
    SAME 64-bit fingerprint with HUGEINT integer arithmetic and takes the
    O(n²) bit_count(xor) ground truth — full value-hash verification of the
    production shape, not just the 28-bit demo."""
    from ..functions.fingerprint import simhash64_udf

    d = rep_documents(spark, sf_dir)
    sig = d.select("doc_id", simhash64_udf(F.col("text")).alias("sh"))
    return _simhash_pairs(
        sig, SIMHASH64_CHUNKS, SIMHASH64_CHUNK_BITS, SIMHASH64_HAMMING_MAX
    )


# ---------------------------------------------------------------------------
# Incremental near-dedup: only the ARRIVING batch pays compute; the history
# side is, in production, a pre-built Iceberg fingerprint index
# (doc_id, sh, chunk key) partitioned by chunk key — here it is derived
# in-plan from the even-doc_id half of `documents` so the query is
# self-contained and oracle-able. Pigeonhole blocking (4×16-bit chunks) is
# exact for Hamming ≤ 3; the uncapped O(n²) DuckDB twin would expose any
# recall lost to BUCKET_CAP, which is inert at tested scales (same
# contract as dedup_simhash64).
# ---------------------------------------------------------------------------


def _incr_sql() -> str:
    return f"""
    WITH th AS (SELECT doc_id,
                       list_transform(string_split(text, ' '), t -> {fnv64_sql('t')}) AS h
                FROM documents),
    d AS (SELECT doc_id, {simhash64_from_hashes_sql('h')} AS sh FROM th),
    nw AS (SELECT * FROM d WHERE doc_id % 2 = 1),
    hist AS (SELECT * FROM d WHERE doc_id % 2 = 0),
    hdrop AS (SELECT DISTINCT n.doc_id FROM nw n
              JOIN hist g ON bit_count(xor(n.sh, g.sh)) <= {SIMHASH64_HAMMING_MAX}),
    bdrop AS (SELECT DISTINCT y.doc_id FROM nw x
              JOIN nw y ON x.doc_id < y.doc_id
               AND bit_count(xor(x.sh, y.sh)) <= {SIMHASH64_HAMMING_MAX})
    SELECT doc_id, max(reason) AS reason FROM (
      SELECT doc_id, 'history' AS reason FROM hdrop
      UNION ALL SELECT doc_id, 'batch' AS reason FROM bdrop
    ) GROUP BY doc_id ORDER BY doc_id
    """


@register("dedup_incremental", oracle=_incr_sql())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dropped-doc decisions for an arriving batch (odd doc_ids) against an
    ingested history (even doc_ids): a new doc is dropped when a 64-bit
    simhash within Hamming <= 3 exists in history ('history') or at a
    smaller doc_id within its own batch ('batch'); history wins when both
    apply. Chunk keys carry the fingerprint alongside (24-byte shuffle
    rows), so both checks verify inline off one exchange per side — no
    join-back to a signature table."""
    from ..functions.fingerprint import simhash64_udf

    d = read_table(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id", simhash64_udf(F.col("text")).alias("sh")
    ).repartition(F.col("doc_id"))  # materialisation barrier (see _simhash_pairs)
    keys = F.explode(
        _chunk_keys(F.col("sh"), SIMHASH64_CHUNKS, SIMHASH64_CHUNK_BITS)
    ).alias("k")
    nw = cap_hot_keys(
        sig.filter(F.col("doc_id") % 2 == 1).select("doc_id", "sh", keys)
    )
    hist = cap_hot_keys(
        sig.filter(F.col("doc_id") % 2 == 0).select("doc_id", "sh", keys)
    )
    ham = lambda a, b: F.bit_count(a.bitwiseXOR(b))  # noqa: E731

    hdrop = (
        nw.alias("x")
        .join(hist.alias("y"), "k")
        .filter(ham(F.col("x.sh"), F.col("y.sh")) <= SIMHASH64_HAMMING_MAX)
        .select(F.col("x.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("reason", F.lit("history"))
    )
    bdrop = (
        nw.alias("x")
        .join(nw.alias("y"), "k")
        .filter(
            (F.col("x.doc_id") < F.col("y.doc_id"))
            & (ham(F.col("x.sh"), F.col("y.sh")) <= SIMHASH64_HAMMING_MAX)
        )
        .select(F.col("y.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("reason", F.lit("batch"))
    )
    return (
        hdrop.unionByName(bdrop)
        .groupBy("doc_id")
        .agg(F.max("reason").alias("reason"))  # 'history' > 'batch'
    )


# ---------------------------------------------------------------------------
# Shingle CONTAINMENT (Broder's asymmetric resemblance): |A∩B| / min sizes.
# Jaccard's structural blind spot is partial duplication — a short page
# quoted wholesale inside a long one has |A∩B| = |A| but tiny Jaccard
# (|A|/|B| can be arbitrarily small), so the symmetric queries above never
# flag it; containment = 1.0 there by construction. Same scalable path as
# dedup_ngram_jaccard (same DF cap, same 8-byte-key self-join — the plan
# differs only in the final arithmetic), both metrics emitted so a
# curator can split "near-identical" (both high) from "quotes/boilerplate
# inclusion" (containment high, jaccard low; planted and asserted in
# tests/test_containment.py).
# ---------------------------------------------------------------------------

CONTAIN_THRESHOLD = 0.5


def _containment_capped_sql(threshold: float, cap: int) -> str:
    sh = shingles_sql("string_split(text, ' ')")
    return f"""
    WITH {_REPS_CTE},
    d AS (SELECT doc_id, {sh} AS sh FROM reps),
    e AS (SELECT doc_id, unnest(sh) AS s FROM d),
    keep_s AS (SELECT s FROM (SELECT s, count(*) AS c FROM e GROUP BY s)
               WHERE c <= {cap}),
    kept AS (SELECT e.doc_id, e.s FROM e JOIN keep_s USING (s)),
    sz AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    p AS (SELECT doc_a, doc_b,
                 inter::DOUBLE / least(sa.n, sb.n) AS containment,
                 inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
          FROM i JOIN sz sa ON sa.doc_id = i.doc_a
                 JOIN sz sb ON sb.doc_id = i.doc_b)
    SELECT doc_a, doc_b,
           round(containment, 6) AS containment,
           round(jaccard, 6) AS jaccard
    FROM p WHERE containment >= {threshold}
    """


def containment_pairs(reps: DataFrame, threshold: float = CONTAIN_THRESHOLD,
                      cap: int = DF_CAP) -> DataFrame:
    """DataFrame-level core over (doc_id, text) representatives."""
    shingled = _shingled_of(reps)
    keyed = shingled.select(
        "doc_id",
        F.explode(F.transform(F.col("sh"), lambda s: F.xxhash64(s))).alias("k"),
    )
    dfreq = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("df"))
    hot = dfreq.filter(F.col("df") > cap).select("k")
    kept = keyed.join(F.broadcast(hot), "k", "left_anti")
    kept = kept.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    inter = (
        kept.alias("x")
        .join(kept.alias("y"), F.col("x.k") == F.col("y.k"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.n").alias("n_a"),
            F.col("y.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cont = F.col("inter").cast("double") / F.least("n_a", "n_b").cast("double")
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return (
        inter.filter(cont >= threshold)
        .select(
            "doc_a", "doc_b",
            F.round(cont, 6).alias("containment"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


@register(
    "dedup_containment",
    oracle=_containment_capped_sql(CONTAIN_THRESHOLD, DF_CAP),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return containment_pairs(rep_documents(spark, sf_dir))


# ---------------------------------------------------------------------------
# MinHash estimator-quality audit: for every LSH candidate pair, the
# 64-coefficient signature ESTIMATE of Jaccard (fraction of agreeing
# minhashes — the statistic banding implicitly thresholds on) side by side
# with the EXACT shingle-set Jaccard, plus the absolute error. This is the
# observability a curator needs before trusting the (bands, rows) choice:
# a drifting corpus (shorter docs, heavier boilerplate) widens the
# estimator error exactly where the threshold sits, and this table shows
# it per pair instead of post-hoc in lost recall. The audit runs on the
# pairs the pipeline actually adjudicates (LSH candidates over exact-dup
# representatives) — estimator behaviour off the candidate set is a
# theoretical property (E[est] = J for the universal family), not an
# operational one.
#
# Scale shape: identical to dedup_minhash_lsh through the candidate step
# (8-byte band keys, capped hot keys); the audit join then ships the
# 64-long signature + distinct shingle-hash array per side — the same
# verify-join payload class as _minhash_pairs' sh64 arrays. Everything is
# exact integer math; est = agree/64 and jaccard = inter/union are single
# IEEE divisions of identical ints, so the twins match bit-for-bit.
#
# The oracle reproduces the ENTIRE pipeline in SQL — 64 literal-coefficient
# min-folds and the 16 band-key folds — which also pins the band_keys_expr
# arithmetic cross-engine (previously only tested Python-kernel vs expr).
# ---------------------------------------------------------------------------


def _minhash_sig_sql(shs: str) -> str:
    from ..functions.fingerprint import MERSENNE31, MINHASH_COEFFS

    mins = ", ".join(
        f"list_min(list_transform({shs}, h -> (h * {a} + {b}) % {MERSENNE31}))"
        for a, b in MINHASH_COEFFS
    )
    return f"[{mins}]"


def _band_keys_sql_terms() -> list[str]:
    """16 band-key expressions over a list column named `sig` — the exact
    integer fold of band_keys_expr (functions/fingerprint.py)."""
    from ..functions.fingerprint import KNUTH, LSH_BANDS, LSH_ROWS, MOD31

    keys = []
    for band in range(LSH_BANDS):
        k = str(band)
        for r in range(LSH_ROWS):
            k = f"(({k} * {KNUTH} + sig[{band * LSH_ROWS + r + 1}]) % {MOD31})"
        keys.append(f"({k} + {band * MOD31}::BIGINT)")
    return keys


def _minhash_audit_sql() -> str:
    from ..functions.fingerprint import token_hash_sql

    sh = shingles_sql("string_split(text, ' ')")
    th = token_hash_sql("x")
    bands = ", ".join(_band_keys_sql_terms())
    return f"""
    WITH {_REPS_CTE},
    d AS (SELECT doc_id,
                 list_distinct(list_transform({sh}, x -> ({th}))) AS shs
          FROM reps),
    s AS (SELECT doc_id, shs, {_minhash_sig_sql('shs')} AS sig FROM d),
    k AS (SELECT doc_id, unnest([{bands}]) AS k FROM s),
    kc AS (SELECT doc_id, k FROM (
             SELECT doc_id, k, count(*) OVER (PARTITION BY k) AS f FROM k)
           WHERE f <= {BUCKET_CAP}),
    c AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM kc a JOIN kc b ON a.k = b.k AND a.doc_id < b.doc_id),
    p AS (
      SELECT doc_a, doc_b,
             list_sum(list_transform(range(1, 65),
               i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
               ::DOUBLE / 64 AS est,
             len(list_intersect(sa.shs, sb.shs))::DOUBLE
               / (len(sa.shs) + len(sb.shs)
                  - len(list_intersect(sa.shs, sb.shs))) AS jac
      FROM c JOIN s sa ON sa.doc_id = c.doc_a
             JOIN s sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b,
           round(est, 6) AS est_jaccard,
           round(jac, 6) AS jaccard,
           round(abs(est - jac), 6) AS abs_err
    FROM p
    """


@register("minhash_est_audit", oracle=_minhash_audit_sql())
def minhash_est_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, est_jaccard, jaccard, abs_err) for every LSH
    candidate pair — the signature-vs-truth audit behind the (16 bands ×
    4 rows) parameter choice. Payload operator (the reference has no
    estimator machinery).

    Signatures and distinct shingle-hash sets come from ONE Arrow-batched
    kernel pass (minhash_audit_series — the slow 64-HOF expression path is
    exactly what the band-key kernel replaced at 20×, and an audit query
    must not reintroduce it); band keys then fold from the sig array as
    pure projections.

    The oracle mirrors the engine's live blocking-key frequency cap
    (candidate_pairs / BUCKET_CAP) with the same `f <= cap` windowed CTE as
    the demo-width dedup_simhash twin — the cap is inert at all three
    tested scales today, but the round-4 simhash experience showed a demo
    parameterization can push a key past the cap at larger sf, and an
    audit twin should stay green when it does. The UNCAPPED ground-truth
    role for the minhash family is carried by dedup_minhash_lsh's twin."""
    from ..functions.fingerprint import band_keys_expr, minhash_audit_udf

    reps = rep_documents(spark, sf_dir)
    sig = (
        reps.select("doc_id", minhash_audit_udf(F.col("text")).alias("m"))
        .select(
            "doc_id",
            F.col("m.shs").alias("shs"),
            F.col("m.sig").alias("sig"),
        )
        .localCheckpoint(eager=False)  # one kernel pass; three consumers
    )
    keyed = sig.select(
        "doc_id", F.explode(band_keys_expr(F.col("sig"))).alias("k")
    )
    cands = candidate_pairs(keyed, "doc_id")
    a = sig.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("shs").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    b = sig.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("shs").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    j = cands.join(a, "doc_id_a").join(b, "doc_id_b")
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda z: z
        )
    )
    est = agree.cast("double") / F.lit(64.0)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = inter / union
    return j.select(
        F.col("doc_id_a").alias("doc_a"),
        F.col("doc_id_b").alias("doc_b"),
        F.round(est, 6).alias("est_jaccard"),
        F.round(jac, 6).alias("jaccard"),
        F.round(F.abs(est - jac), 6).alias("abs_err"),
    )
