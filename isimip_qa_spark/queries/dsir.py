"""DSIR-style data selection over `documents` (Data Selection via
Importance Resampling, Xie et al. 2023, NeurIPS — public method).

Given a small target-domain sample and the big raw pool, DSIR fits two
bag-of-hashed-n-grams unigram models (target p̂ and raw q̂ over B hash
buckets), scores every raw document with the importance log-weight
log w(x) = Σ_{g ∈ ngrams(x)} [ln p̂(bucket(g)) − ln q̂(bucket(g))],
and resamples via Gumbel-top-k on the log-weights. Here the target sample
is carved deterministically out of the corpus (doc_id % TARGET_MOD == 0,
the same self-contained device `queries/decontaminate.py` uses for its
benchmark side), so the whole chain is oracle-able.

Three registered faces:
- `dsir_logratio` — the fitted B-bucket model: per-bucket target/raw
  counts and the smoothed log-likelihood-ratio, quantized to a dyadic
  grid (multiples of 1/1024) so every downstream per-doc SUM is exact in
  IEEE double regardless of accumulation order (the
  `functions/perplexity.py` determinism contract).
- `dsir_weights` — per-raw-doc importance log-weight. The B-bucket model
  is collected once driver-side (B rows, small-by-construction — the
  two-pass histogram precedent, reference_ops.py A7/A8) and folded
  map-side as an array-literal lookup: ZERO shuffle for scoring.
- `dsir_select` — Gumbel-top-K resample: key = logweight + Gumbel(0,1)
  with the uniform drawn from the doc's content fingerprint (seedless,
  reproducible, task-retry-safe — `rand()` is banned for the same reasons
  as in queries/mixing.py).

Scale shape (100 TB):
- Model fit is ONE pass: explode hashed n-gram buckets inside the map
  stage, hash-aggregate on the 8-byte bucket key — partial-aggregable,
  and the aggregate output is exactly B rows no matter the corpus size.
  Nothing document-sized ever shuffles.
- Scoring is a narrow map (fold over the doc's own n-gram buckets against
  a broadcast-sized literal array); the only post-scan work in
  `dsir_select` is TakeOrderedAndProject (per-partition top-K, then K·P
  rows to the driver-side merge), never a full sort.
- The n-gram feature space is hashed to B buckets up front, so model size
  is O(B) independent of vocabulary — the property that makes DSIR run at
  crawl scale at all.

Reference anchor: the reference has no selection stage (climate QA); this
operator family comes from the training-data-pipeline mandate
(SURVEY.md §2.9 extension set), beside mixing/selection/packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions.fingerprint import (
    KNUTH,
    MOD31,
    rolling_fingerprint_expr,
    rolling_fingerprint_sql,
    token_hash_expr,
    token_hash_sql,
)
from ..functions.textstats import tokens_expr
from . import register

B = 1024  # hash-feature buckets (model size O(B), vocab-independent)
TARGET_MOD = 10  # doc_id % TARGET_MOD == 0 → target-domain sample
ALPHA = 1  # Laplace smoothing count
Q = 1024  # dyadic quantization grid for the per-bucket log-ratio
SELECT_K = 200  # Gumbel-top-k resample size
_UPRIME = (1 << 31) - 1  # uniform grain for the Gumbel draw

_TOKENS_SQL = "string_split(text, ' ')"


# --- hashed n-gram features (unigram + bigram), engine-portable ----------


def _ngram_buckets_expr(tokens: Column) -> Column:
    """Unigram + bigram hash buckets in [0, B) as one array<bigint>.
    Bigram hash chains the portable token hash with the same KNUTH
    multiplier the token hash itself uses; everything stays < 2^62."""
    n = F.size(tokens)
    uni = F.transform(tokens, lambda t: token_hash_expr(t) % F.lit(B))
    big = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: (
                token_hash_expr(F.element_at(tokens, i)) * F.lit(KNUTH)
                + token_hash_expr(F.element_at(tokens, i + 1))
            )
            % F.lit(MOD31)
            % F.lit(B),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, big)


def _ngram_buckets_sql(tokens_sql: str) -> str:
    """DuckDB twin of `_ngram_buckets_expr` (1-based list indexing)."""
    t = tokens_sql
    th_i = token_hash_sql(f"{t}[i]")
    th_j = token_hash_sql(f"{t}[i+1]")
    uni = f"list_transform({t}, x -> ({token_hash_sql('x')}) % {B})"
    big = (
        f"list_transform(range(1, greatest(len({t}) - 1, 0) + 1), "
        f"i -> ((({th_i}) * {KNUTH} + ({th_j})) % {MOD31}) % {B})"
    )
    return f"list_concat({uni}, {big})"


# --- model fit: per-bucket counts + dyadic log-likelihood ratio ----------

# Shared SQL CTE chain: per-bucket counts densified over all B buckets,
# totals, and the quantized log-ratio. DuckDB's range() table function
# exposes its value as column `range`.
_MODEL_CTE = f"""
WITH ng AS (
  SELECT doc_id % {TARGET_MOD} = 0 AS is_target,
         unnest({_ngram_buckets_sql(_TOKENS_SQL)}) AS bucket
  FROM documents
),
cnt AS (
  SELECT bucket,
         count(*) FILTER (is_target) AS target_cnt,
         count(*) FILTER (NOT is_target) AS raw_cnt
  FROM ng GROUP BY bucket
),
dense AS (
  SELECT r.range AS bucket,
         coalesce(cnt.target_cnt, 0)::BIGINT AS target_cnt,
         coalesce(cnt.raw_cnt, 0)::BIGINT AS raw_cnt
  FROM range({B}) r LEFT JOIN cnt ON r.range = cnt.bucket
),
model AS (
  SELECT bucket, target_cnt, raw_cnt,
         round((ln((target_cnt + {ALPHA})::DOUBLE
                   / (sum(target_cnt) OVER () + {ALPHA * B}))
              - ln((raw_cnt + {ALPHA})::DOUBLE
                   / (sum(raw_cnt) OVER () + {ALPHA * B}))) * {Q}) / {Q}
           AS logratio
  FROM dense
)
"""


def _model_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the B-bucket model as a DataFrame: one explode+hash-agg pass
    (output exactly B rows), densified against spark.range(B)."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ng = d.select(
        (F.col("doc_id") % TARGET_MOD == 0).alias("is_target"),
        F.explode(_ngram_buckets_expr(tokens_expr(F.col("text")))).alias("bucket"),
    )
    cnt = ng.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("target_cnt"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("raw_cnt"),
    )
    dense = (
        spark.range(B)
        .withColumnRenamed("id", "bucket")
        .join(F.broadcast(cnt), "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("target_cnt"), F.lit(0)).cast("long").alias("target_cnt"),
            F.coalesce(F.col("raw_cnt"), F.lit(0)).cast("long").alias("raw_cnt"),
        )
    )
    # totals over B rows — tiny; window-free via a broadcast 1-row cross join
    tot = dense.agg(
        F.sum("target_cnt").alias("t_tot"), F.sum("raw_cnt").alias("r_tot")
    )
    lr = (
        F.round(
            (
                F.log((F.col("target_cnt") + ALPHA) / (F.col("t_tot") + ALPHA * B))
                - F.log((F.col("raw_cnt") + ALPHA) / (F.col("r_tot") + ALPHA * B))
            )
            * Q
        )
        / Q
    )
    return dense.crossJoin(F.broadcast(tot)).select(
        "bucket", "target_cnt", "raw_cnt", lr.alias("logratio")
    )


@register(
    "dsir_logratio",
    oracle=_MODEL_CTE + "SELECT bucket, target_cnt, raw_cnt, logratio FROM model",
)
def dsir_logratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted hashed-n-gram importance model (B rows)."""
    return _model_df(spark, sf_dir)


# --- scoring: zero-shuffle fold over a broadcast-sized literal array -----


def _logratio_array(spark: SparkSession, sf_dir: str) -> list[float]:
    """Collect the B quantized log-ratios (bucket-ordered). B rows — the
    same small-by-construction driver hop as the two-pass histogram."""
    rows = _model_df(spark, sf_dir).select("bucket", "logratio").collect()
    arr = [0.0] * B
    for r in rows:
        arr[r["bucket"]] = r["logratio"]
    return arr


def _weights_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    lr = _logratio_array(spark, sf_dir)
    arr = F.array(*[F.lit(v) for v in lr])
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    buckets = _ngram_buckets_expr(tokens_expr(F.col("text")))
    lw = F.aggregate(
        F.transform(buckets, lambda b: F.element_at(arr, (b + 1).cast("int"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.filter(F.col("doc_id") % TARGET_MOD != 0).select(
        "doc_id",
        F.size(buckets).cast("long").alias("n_grams"),
        lw.alias("logweight"),
    )


_WEIGHTS_SQL = (
    _MODEL_CTE
    + f""",
lrarr AS (SELECT list(logratio ORDER BY bucket) AS arr FROM model),
scored AS (
  SELECT doc_id,
         len({_ngram_buckets_sql(_TOKENS_SQL)})::BIGINT AS n_grams,
         list_sum(list_transform({_ngram_buckets_sql(_TOKENS_SQL)},
                                 b -> arr[(b + 1)::INT]))::DOUBLE AS logweight
  FROM documents, lrarr
  WHERE doc_id % {TARGET_MOD} != 0
)
"""
)


@register("dsir_weights", oracle=_WEIGHTS_SQL + "SELECT * FROM scored")
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-raw-doc DSIR importance log-weight. Dyadic per-bucket values ⇒
    the fold is bit-exact across engines with no rounding."""
    return _weights_df(spark, sf_dir)


# --- Gumbel-top-k resample ------------------------------------------------


def _gumbel_expr(text: Column) -> Column:
    """Seedless Gumbel(0,1): u ∈ (0,1) from the doc's content fingerprint
    (exact int64 both engines), g = -ln(-ln(u))."""
    u = ((rolling_fingerprint_expr(tokens_expr(text)) % _UPRIME) + 1) / F.lit(
        float(_UPRIME + 2)
    )
    return -F.log(-F.log(u))


def _gumbel_sql() -> str:
    fp = rolling_fingerprint_sql(_TOKENS_SQL)
    return (
        f"-ln(-ln((({fp}) % {_UPRIME} + 1)::DOUBLE / {float(_UPRIME + 2)!r}))"
    )


@register(
    "dsir_select",
    oracle=_WEIGHTS_SQL.replace(
        "AS logweight",
        "AS logweight, round(__GUMBEL__ + __LW__, 6) AS gumbel_key",
    )
    .replace("__GUMBEL__", _gumbel_sql())
    .replace(
        "__LW__",
        f"list_sum(list_transform({_ngram_buckets_sql(_TOKENS_SQL)},"
        f" b -> arr[(b + 1)::INT]))::DOUBLE",
    )
    + f"""
SELECT doc_id, logweight, gumbel_key FROM scored
ORDER BY gumbel_key DESC, doc_id LIMIT {SELECT_K}
""",
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-K importance resample: the K docs with the largest
    logweight + Gumbel(0,1) — i.e. sampling without replacement with
    probability ∝ exp(logweight), made deterministic by the seedless
    fingerprint-derived uniform. Plan is TakeOrderedAndProject (per-task
    top-K, K·P driver merge), never a global sort."""
    w = _weights_df(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    g = d.filter(F.col("doc_id") % TARGET_MOD != 0).select(
        "doc_id", _gumbel_expr(F.col("text")).alias("g")
    )
    # both sides derive from the same scan; recombine on the 8-byte doc_id.
    # (kept as a join so each face stays independently testable; Catalyst
    # collapses it to one scan via exchange reuse when sides share the plan)
    key = F.round(F.col("g") + F.col("logweight"), 6)
    return (
        w.join(g, "doc_id")
        .select("doc_id", "logweight", key.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), "doc_id")
        .limit(SELECT_K)
    )
