"""Broadcast Bloom-filter membership prefilter against an ingested history.

`dedup_incremental` (dedup.py) answers "is this arriving doc a near-dup of
history?" with a key join against a history index — correct, but the join
shuffles (a slice of) the arriving batch. At crawl scale the far more
common question is *exact* re-crawl membership ("have we ingested this
byte-identical page before?"), and the production answer is a Bloom
prefilter: build a fixed-size bitmap over the history's content digests
ONCE, broadcast it, and probe it map-side — the 100-TB arriving side never
shuffles; only the tiny bloom-positive slice pays the exact-verify join.
The reference's analogue is its artifact-cache skip gate
(/root/reference/isimip_qa/main.py:126-128: recompute only what a cheap
existence probe doesn't already cover).

Cross-engine portability: the digest is md5 (same bytes-in, same hex-out in
Spark and DuckDB — the snapshot_diff contract, versioning.py), folded into
two independent 60-bit int64 halves by interpreting hex substrings
(Spark `conv`, DuckDB digit fold — bit-identical, asserted by the oracle).
K probe positions come from standard double hashing
pos_i = (h1 + i*h2) mod M (Kirsch-Mitzenmacher), so both engines compute
the *same* bitmap and the same hits: the oracle match is exact, false
positives included.

Scale shape:

- Build: history → K positions/doc → DISTINCT — a map-side-combining
  aggregate whose output is bounded by M (2^17 here) REGARDLESS of history
  size; the driver packs it into M/64 int64 words. Here the bitmap ships
  as an array literal so the probe stays inside whole-stage codegen
  (getbit + element_at); at production M (2^33+ bits) the identical bitmap
  ships as a broadcast variable probed by a numpy kernel inside the fused
  Arrow pass (functions/qa_fused.py pattern) — same architecture, same
  single scan, zero shuffle of the arriving side.
- Probe: bloom_hit is a pure column expression; no-false-negative by
  construction (every history doc set its own bits).
- Verify: only bloom_hit rows enter the exact join against history digest
  keys (left-semi on two int64s, 16 bytes/row) — the prefilter prunes the
  join input to (true dups + FP rate); the result joins back on doc_id.
  FP sizing: with H history keys, FP ≈ (1 - e^{-K·H/M})^K; the demo M
  gives ~0 at test scale, production sizes M ≈ 10 bits/key for ~1.2%.

Output (arriving = odd doc_ids, the dedup_incremental convention):
doc_id, bloom_hit, exact_hit (exact_hit ⇒ bloom_hit; bloom_hit AND NOT
exact_hit rows are the measured false positives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from . import register

M_BITS = 1 << 17  # demo bitmap size; production: ~10 bits per history key
N_HASH = 4


def _fold_sql(lo: int, hi: int) -> str:
    """DuckDB: md5 hex chars [lo, hi] (1-based, 15 digits) → int64."""
    return (
        f"list_reduce(list_transform(range({lo}, {hi + 1}), "
        f"i -> (strpos('0123456789abcdef', md5(text)[i:i]) - 1)::BIGINT), "
        f"(a, d) -> a * 16 + d)"
    )


def _bloom_sql() -> str:
    pos = [f"(h1 + {i} * h2) % {M_BITS}" for i in range(N_HASH)]
    hit = " AND ".join(f"({p} IN (SELECT p FROM hp))" for p in pos)
    return f"""
    WITH d AS (
      SELECT doc_id, {_fold_sql(1, 15)} AS h1, {_fold_sql(17, 31)} AS h2
      FROM documents
    ),
    hist AS (SELECT * FROM d WHERE doc_id % 2 = 0),
    cur AS (SELECT * FROM d WHERE doc_id % 2 = 1),
    hp AS (
      SELECT DISTINCT (h1 + i * h2) % {M_BITS} AS p
      FROM hist, UNNEST(range(0, {N_HASH})) AS u(i)
    )
    SELECT doc_id,
           ({hit}) AS bloom_hit,
           ({hit}) AND EXISTS (
             SELECT 1 FROM hist h
             WHERE h.h1 = cur.h1 AND h.h2 = cur.h2
           ) AS exact_hit
    FROM cur
    """


def digest_exprs() -> tuple:
    """(h1, h2) column expressions over `text` — THE digest definition;
    batch query and streaming prefilter must share it bit-for-bit or the
    stream probes a bitmap built from different digests."""
    h1 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("text"), 17, 15), 16, 10).cast("long")
    return h1, h2


def _digests(docs: DataFrame) -> DataFrame:
    h1, h2 = digest_exprs()
    return docs.select("doc_id", h1.alias("h1"), h2.alias("h2"))


def _positions():
    return F.array(
        *[
            ((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(M_BITS)).cast("int")
            for i in range(N_HASH)
        ]
    )


def build_bitmap(hist_digests: DataFrame) -> list[int]:
    """History (h1, h2) rows → packed signed-int64 bitmap words. The
    DISTINCT set-bit aggregate is bounded by M_BITS regardless of history
    size; only ≤ M_BITS positions ever reach the driver."""
    set_bits = hist_digests.select(F.explode(_positions()).alias("p")).distinct()
    words = [0] * (M_BITS // 64)
    for row in set_bits.collect():
        words[row.p >> 6] |= 1 << (row.p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_hit_expr(bitmap_words: list[int]):
    """Pure-expression probe: true iff all N_HASH positions of the row's
    (h1, h2) digest are set in the literal bitmap (whole-stage codegen,
    usable identically in batch and streaming plans)."""
    bitmap = F.lit(bitmap_words)

    def bit_set(p):
        word = F.element_at(bitmap, F.shiftright(p, 6) + 1)
        return F.getbit(word, p.bitwiseAND(F.lit(63))) == 1

    return F.forall(_positions(), bit_set)


def bloom_flags(docs: DataFrame) -> DataFrame:
    """DataFrame-level core over (doc_id, text) — planted-duplicate tests
    drive this directly; the registered query feeds it the parquet table."""
    d = _digests(docs)
    hist = d.filter(F.col("doc_id") % 2 == 0)
    cur = d.filter(F.col("doc_id") % 2 == 1)

    flagged = cur.withColumn("bloom_hit", bloom_hit_expr(build_bitmap(hist)))

    # Exact verify only on the bloom-positive slice (the prefilter payoff).
    exact = (
        flagged.filter("bloom_hit")
        .join(hist.select("h1", "h2").distinct(), ["h1", "h2"], "left_semi")
        .select("doc_id", F.lit(True).alias("exact_hit"))
    )
    return flagged.join(exact, "doc_id", "left").select(
        "doc_id",
        "bloom_hit",
        F.coalesce("exact_hit", F.lit(False)).alias("exact_hit"),
    )


@register("bloom_dedup", oracle=_bloom_sql())
def bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_flags(read_table(spark, sf_dir, "documents"))
