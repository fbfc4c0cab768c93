"""Reference-operator twins (SURVEY.md §2) over the driver's TPC-H-ish tables.

Each query cites the reference operator(s) it re-expresses. Scale notes are
inline: the plans are written so Catalyst pushes filters into the parquet
scan, prunes columns, broadcasts dimension tables, and runs partial/final
hash aggregation — the properties that carry to a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from . import register
from ._util import cents, cents_sql

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary.
# Reference ops composed: F1 time slice (mean.py:21-22), A2/A3 grouped
# aggregation with skipna (mean.py:35, count.py:25), partial/final combine
# across files (histogram.py:56-59) — subsumed by HashAggregateExec.
# Exact across engines: integer-cents sums (see _util.cents).
# ---------------------------------------------------------------------------

_Q1_CUT = "1998-09-02 00:00:00"


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum({cents_sql('l_extendedprice')}) / 100.0 AS sum_base_price,
           sum({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) / 10000.0 AS sum_disc_price,
           sum({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')}) * (100 + {cents_sql('l_tax')})) / 1000000.0 AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           sum({cents_sql('l_extendedprice')}) / 100.0 / count(*) AS avg_price,
           sum({cents_sql('l_discount')}) / 100.0 / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUT}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit(_Q1_CUT))
    )
    c_price = cents(F.col("l_extendedprice"))
    c_disc = cents(F.col("l_discount"))
    c_tax = cents(F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        (F.sum(c_price) / 100.0).alias("sum_base_price"),
        (F.sum(c_price * (100 - c_disc)) / 10000.0).alias("sum_disc_price"),
        (F.sum(c_price * (100 - c_disc) * (100 + c_tax)) / 1000000.0).alias(
            "sum_charge"
        ),
        (F.sum("l_quantity") / n).alias("avg_qty"),
        (F.sum(c_price) / 100.0 / n).alias("avg_price"),
        (F.sum(c_disc) / 100.0 / n).alias("avg_disc"),
        n.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# A1/A2 — weighted mean with skipna weight normalisation
# (/root/reference/isimip_qa/extractions/mean.py:30-35): weight sum counts
# only rows whose value is non-null.
# ---------------------------------------------------------------------------


@register(
    "weighted_mean",
    oracle=f"""
    SELECT l_returnflag,
           sum({cents_sql('l_extendedprice')} * CAST(l_quantity AS BIGINT)) / 100.0
             / sum(CASE WHEN l_extendedprice IS NOT NULL THEN CAST(l_quantity AS BIGINT) END) AS wmean_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    w_sum = F.sum(F.when(F.col("l_extendedprice").isNotNull(), qty))
    return li.groupBy("l_returnflag").agg(
        (F.sum(cents(F.col("l_extendedprice")) * qty) / 100.0 / w_sum).alias(
            "wmean_price"
        )
    )


# ---------------------------------------------------------------------------
# F1 + A3 — inclusive time-slice + non-null count per time step
# (mean.py:21-22 slice; count.py:25 count). Filter reaches the parquet scan.
# ---------------------------------------------------------------------------

_SLICE_LO = "2024-01-05 00:00:00"
_SLICE_HI = "2024-01-20 23:59:59"


@register(
    "count_nonnull_daily",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(value) AS cnt,
           sum({cents_sql('value')}) / 100.0 AS sum_value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_SLICE_LO}' AND TIMESTAMP '{_SLICE_HI}'
    GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def count_nonnull_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts").between(
            F.to_timestamp(F.lit(_SLICE_LO)), F.to_timestamp(F.lit(_SLICE_HI))
        )
    )
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("value").alias("cnt"),
        (F.sum(cents(F.col("value"))) / 100.0).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# A4 — per-cell count over time ("countmap", countmap.py:27-32); the
# reference's cross-file `+=` is Spark partial/final aggregation.
# ---------------------------------------------------------------------------


@register(
    "countmap",
    oracle="SELECT user_id, count(value) AS cnt FROM events GROUP BY user_id",
)
def countmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(F.count("value").alias("cnt"))


# ---------------------------------------------------------------------------
# A5/A6 — meanmap with the reference's biased-divisor quirk
# (meanmap.py:29-38): divisor is the *scalar* total time-step count, not the
# per-cell non-null count. Also the min_count=1 sum (all-null group → NULL).
# Scalar divisor: broadcast crossJoin of a 1-row aggregate (no shuffle).
# ---------------------------------------------------------------------------


@register(
    "meanmap_compat",
    oracle=f"""
    SELECT user_id,
           sum({cents_sql('value')}) / 100.0 / t.td AS cell_mean,
           CAST(sum(CASE WHEN event_type = 'error' THEN {cents_sql('value')} END) AS BIGINT) AS err_cents
    FROM events CROSS JOIN
         (SELECT count(DISTINCT CAST(ts AS DATE)) AS td FROM events) t
    GROUP BY user_id, t.td
    """,
)
def meanmap_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    total_days = ev.agg(
        F.countDistinct(F.to_date("ts")).alias("td")
    )
    return (
        ev.crossJoin(F.broadcast(total_days))
        .groupBy("user_id", "td")
        .agg(
            (F.sum(cents(F.col("value"))) / 100.0 / F.first("td")).alias("__m"),
            F.sum(
                F.when(F.col("event_type") == "error", cents(F.col("value")))
            ).alias("err_cents"),
        )
        .select(
            "user_id",
            F.col("__m").alias("cell_mean"),
            "err_cents",
        )
    )


# ---------------------------------------------------------------------------
# A7/A8 — two-pass fixed-width histogram with empty bins materialised
# (histogram.py:33-59): pass 1 global min/max fixes (origin, step); pass 2 is
# a hash aggregation on the bin key; `sequence()` + left join reproduces the
# reference's reindex-fill-0 empty edge bins. The identical expression tree
# on both engines makes the IEEE bin arithmetic bit-equal.
# ---------------------------------------------------------------------------

_HIST_SQL = f"""
    WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
                FROM lineitem),
    binned AS (
      SELECT least(CAST(floor((l_extendedprice - mm.mn) / ((mm.mx - mm.mn) / 100.0)) AS BIGINT), 99) AS bin
      FROM lineitem, mm
    ),
    counts AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY bin)
    SELECT t.bin, coalesce(counts.cnt, 0) AS cnt
    FROM (SELECT CAST(range AS BIGINT) AS bin FROM range(100)) t
    LEFT JOIN counts ON t.bin = counts.bin
"""


def _histogram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    binned = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("mn"))
                / ((F.col("mx") - F.col("mn")) / 100.0)
            ).cast("long"),
            F.lit(99).cast("long"),
        ).alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    bins = spark.range(100).select(F.col("id").alias("bin"))
    return (
        bins.join(counts, "bin", "left")
        .select("bin", F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"))
    )


@register("histogram", oracle=_HIST_SQL)
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _histogram_counts(spark, sf_dir)


# A13 — PDF normalise (pdf.py:16-18): count / total, exact int division.
@register(
    "histogram_pdf",
    oracle=f"""
    WITH h AS ({_HIST_SQL})
    SELECT bin, CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM h) AS p FROM h
    """,
)
def histogram_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _histogram_counts(spark, sf_dir)
    total = F.sum("cnt").over(Window.partitionBy())
    return h.select(
        "bin", (F.col("cnt").cast("double") / total).alias("p")
    )


# A14 — CDF via the reference's only true window function (cdf.py:16-18, W3).
@register(
    "histogram_cdf",
    oracle=f"""
    WITH h AS ({_HIST_SQL})
    SELECT bin,
           CAST(sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (SELECT sum(cnt) FROM h) AS cdf
    FROM h
    """,
)
def histogram_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _histogram_counts(spark, sf_dir)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = F.sum("cnt").over(Window.partitionBy())
    return h.select(
        "bin", (F.sum("cnt").over(w).cast("double") / total).alias("cdf")
    )


# ---------------------------------------------------------------------------
# A10 — calendar rollup: per-day mean + sample std (yearly.py:17-21; pandas
# ddof=1 == Spark/DuckDB stddev_samp). Mean is exact (cents); std rounded.
# ---------------------------------------------------------------------------


@register(
    "calendar_stats",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           sum({cents_sql('value')}) / 100.0 / count(value) AS mean_value,
           round(stddev_samp(value), 6) AS std_value
    FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def calendar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        (F.sum(cents(F.col("value"))) / 100.0 / F.count("value")).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("std_value"),
    )


# ---------------------------------------------------------------------------
# A11/A12 — climatology + z-normalisation against the global mean/std of the
# group means, with the reference's std==0→1.0 guard (dayofyear.py:16-19,
# monthofyear.py:16-19).
# ---------------------------------------------------------------------------


def _climatology(spark, sf_dir, spark_key, sql_key, name):
    ev = read_table(spark, sf_dir, "events")
    m = ev.groupBy(spark_key.alias("k")).agg(
        (F.sum(cents(F.col("value"))) / 100.0 / F.count("value")).alias("m")
    )
    w = Window.partitionBy()
    mu = F.avg("m").over(w)
    sd = F.stddev_samp("m").over(w)
    guard = F.when(sd.isNull() | (sd == 0), F.lit(1.0)).otherwise(sd)
    return m.select("k", "m", F.round((F.col("m") - mu) / guard, 6).alias("z"))


def _climatology_sql(sql_key: str) -> str:
    return f"""
    WITH m AS (
      SELECT {sql_key} AS k,
             sum({cents_sql('value')}) / 100.0 / count(value) AS m
      FROM events GROUP BY {sql_key}
    )
    SELECT k, m,
           round((m - avg(m) OVER ()) /
                 (CASE WHEN stddev_samp(m) OVER () IS NULL
                         OR stddev_samp(m) OVER () = 0
                       THEN 1.0 ELSE stddev_samp(m) OVER () END), 6) AS z
    FROM m
    """


@register("climatology_doy_znorm", oracle=_climatology_sql("dayofyear(ts)"))
def climatology_doy_znorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _climatology(
        spark, sf_dir, F.dayofyear("ts").cast("long"), "dayofyear(ts)", "doy"
    )


@register("climatology_moy_znorm", oracle=_climatology_sql("month(ts)"))
def climatology_moy_znorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _climatology(spark, sf_dir, F.month("ts").cast("long"), "month(ts)", "moy")


@register("climatology_hod_znorm", oracle=_climatology_sql("hour(ts)"))
def climatology_hod_znorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _climatology(spark, sf_dir, F.hour("ts").cast("long"), "hour(ts)", "hod")


# ---------------------------------------------------------------------------
# A15 — axis range: min of positive values ×0.99, max ×1.01, per group
# (mixins/plots.py:259-292).
# ---------------------------------------------------------------------------


@register(
    "axis_range",
    oracle="""
    SELECT event_type,
           min(CASE WHEN value > 0 THEN value END) * 0.99 AS lo,
           max(value) * 1.01 AS hi
    FROM events GROUP BY event_type
    """,
)
def axis_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (F.min(F.when(F.col("value") > 0, F.col("value"))) * 0.99).alias("lo"),
        (F.max("value") * 1.01).alias("hi"),
    )


# ---------------------------------------------------------------------------
# J1/F3 — the mask predicate as a broadcast equi-join with a small dim table
# (mean.py:27-28; models.py:83-86). nation⋈region is tiny → explicit
# broadcast; at 100 TB the fact side never shuffles for this join.
# ---------------------------------------------------------------------------


@register(
    "mask_semi_join",
    oracle=f"""
    SELECT r.r_name,
           count(*) AS n_customers,
           sum({cents_sql('c_acctbal')}) / 100.0 AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def mask_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(cents(F.col("c_acctbal"))) / 100.0).alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# F2/W5 — nearest-neighbour select = top-1 by distance with deterministic
# tie-break (mean.py:24-25). On a regular grid the reference's closed-form
# alternative is a plain filter; here the general orderBy+limit form.
# ---------------------------------------------------------------------------


@register(
    "nearest_point",
    oracle="""
    SELECT event_id, value, abs(value - 250.0) AS dist
    FROM events ORDER BY abs(value - 250.0), event_id LIMIT 1
    """,
)
def nearest_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    dist = F.abs(F.col("value") - F.lit(250.0))
    return (
        ev.select("event_id", "value", dist.alias("dist"))
        .orderBy("dist", "event_id")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# F8 — non-null bounding box (plots/map.py:36-53): min/max of key columns
# over rows passing a non-null/threshold predicate.
# ---------------------------------------------------------------------------


@register(
    "bbox_nonnull",
    oracle="""
    SELECT min(strftime(ts, '%Y-%m-%d')) AS ts_min, max(strftime(ts, '%Y-%m-%d')) AS ts_max,
           min(user_id) AS user_min, max(user_id) AS user_max,
           count(*) AS n
    FROM events WHERE value IS NOT NULL AND value > 450.0
    """,
)
def bbox_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 450.0)
    )
    return ev.agg(
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("ts_min"),
        F.max(F.date_format("ts", "yyyy-MM-dd")).alias("ts_max"),
        F.min("user_id").alias("user_min"),
        F.max("user_id").alias("user_max"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# F10 — distinct + step inference via lag (plots/map.py:37-46): the
# reference's grid-step detection; Spark's lag window over the distinct set.
# ---------------------------------------------------------------------------


@register(
    "distinct_step",
    oracle="""
    WITH d AS (SELECT DISTINCT l_quantity AS q FROM lineitem),
    s AS (SELECT q, q - lag(q) OVER (ORDER BY q) AS step FROM d)
    SELECT min(step) AS min_step, max(step) AS max_step,
           count(*) AS n_distinct
    FROM s
    """,
)
def distinct_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_quantity").alias("q")).distinct()
    s = d.select(
        "q", (F.col("q") - F.lag("q").over(Window.orderBy("q"))).alias("step")
    )
    return s.agg(
        F.min("step").alias("min_step"),
        F.max("step").alias("max_step"),
        F.count(F.lit(1)).alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# F1 — pure time-slice pushdown demo on the big fact table; the predicate
# must appear in the scan's PushedFilters (checked in tests).
# ---------------------------------------------------------------------------


@register(
    "time_slice",
    oracle=f"""
    SELECT count(*) AS n, sum({cents_sql('l_extendedprice')}) / 100.0 AS sum_price
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
    """,
)
def time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.to_timestamp(F.lit("1996-01-01 00:00:00")),
            F.to_timestamp(F.lit("1996-12-31 00:00:00")),
        )
    )
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# A9 — attrs/manifest extraction (attrs.py:14-22): the schema snapshot as
# rows. The Spark side derives from the live schema (a genuine drift check);
# the oracle pins the declared schema.
# ---------------------------------------------------------------------------

_LINEITEM_TYPES = [
    ("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
    ("l_linenumber", "int"), ("l_quantity", "double"),
    ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"),
    ("l_returnflag", "string"), ("l_linestatus", "string"),
    # parquet timestamps are timezone-naive → Spark 4 reads TIMESTAMP_NTZ
    ("l_shipdate", "timestamp_ntz"),
]


@register(
    "attrs_manifest",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('{c}', '{t}')" for c, t in _LINEITEM_TYPES)
    + ") AS t(col_name, data_type)",
)
def attrs_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    rows = [(f.name, f.dataType.simpleString()) for f in li.schema.fields]
    return spark.createDataFrame(rows, "col_name string, data_type string")
