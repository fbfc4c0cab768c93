"""Coverage extensions: ranking, pivot (W4), sessionization, anti-join,
C4-style sentence filters — operators a full analytics engine needs that the
reference only gestures at (pivot: plots/map.py:69; ordering: plots/map.py:70).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from . import register
from ._util import cents, cents_sql

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# W4 — pivot: day × event_type counts (reference pivots lat × lon for maps).
@register(
    "pivot_daily_events",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
    FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def pivot_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[
                F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
                for t in EVENT_TYPES
            ],
        )
    )


# Ranking — top-3 orders by totalprice per priority (row_number window; the
# reference has no ranking functions — engine-completeness op).
@register(
    "topk_per_group",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM r WHERE rnk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


# Sessionization — gap > 30 min starts a new session per user (lag window +
# running sum; the batch shape of streaming session windows).
@register(
    "sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM g
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start
    FROM s GROUP BY user_id, sess_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800),
        1,
    ).otherwise(0)
    # event_id tie-break matches the gap detector's order — without it,
    # duplicate (user_id, ts) rows make the session assignment
    # nondeterministic (latent even when fixture data is duplicate-free)
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_id", F.sum("new_sess").over(wsum).cast("long")
    )
    return s.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
    )


# Anti-join — customers that placed no orders (the engine's semi/anti story;
# broadcast the small side).
@register(
    "anti_join_idle_customers",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_idle
    FROM customer c ANTI JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_idle"))


# C4-style sentence filters (Raffel et al. 2020): terminal punctuation,
# minimum sentence count, brace/lorem flags — pure exprs on documents.
@register(
    "c4_filters",
    oracle="""
    SELECT doc_id,
           (text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?') AS ends_terminal,
           len(regexp_extract_all(text, '[.!?]')) >= 3 AS has_3_sentences,
           contains(text, '{') AS has_brace,
           contains(lower(text), 'lorem ipsum') AS has_lorem,
           (NOT contains(text, '{')
            AND NOT contains(lower(text), 'lorem ipsum')) AS c4_pass
    FROM documents
    """,
)
def c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    ends_terminal = (
        text.endswith(".") | text.endswith("!") | text.endswith("?")
    )
    has_brace = text.contains("{")
    has_lorem = F.lower(text).contains("lorem ipsum")
    return d.select(
        "doc_id",
        ends_terminal.alias("ends_terminal"),
        (F.regexp_count(text, F.lit(r"[.!?]")) >= 3).alias("has_3_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        (~has_brace & ~has_lorem).alias("c4_pass"),
    )
