"""URL-identity operators over `documents`: canonicalization, latest-capture
dedup, and host blocklist filtering — the identity/provenance stage that runs
before content dedup in a crawl pipeline.

The test tables carry no URL column, so each query derives a deterministic
messy URL from (doc_id, source) with the same expression in both engines
(the functions/extract.py fixture pattern) and then runs the production
canonicalization exprs on it. The derivation exercises every rule: mixed
scheme/host case, a default :80 port, shuffled query-param order, tracking
params, and fragments.

Scale notes (100 TB):
- url_canonicalize is a pure narrow map — no shuffle, pushes into the scan.
- dedup_url_latest groups on the canonical-url *string*; at crawl scale the
  exchange key would be xxhash64(canon) with the same 8-byte-key discipline
  as dedup_exact (the window's orderBy then needs (capture, doc) only —
  16 bytes/row through the shuffle). Latest-capture-wins is the standard
  recrawl policy (new snapshot replaces old).
- host_blocklist is a broadcast (hash) anti-join: the blocklist (UT1-style
  category lists, ~MBs) always fits in a broadcast; the corpus never
  shuffles. The plan is asserted broadcast in tests/test_urlops.py.

Reference anchor: isimip_qa/config.py:38-65 lower-cases formatted dataset
paths into canonical identities before globbing; these queries are the
web-corpus analogue where the identity is a URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions.urlops import (
    canonical_url_expr,
    canonical_url_sql,
    url_host_expr,
    url_host_sql,
)
from . import register

BLOCKED_HOSTS = ("src1.example.com", "src7.example.com", "src13.example.com")


def _messy_url_expr() -> F.Column:
    """Deterministic messy URL from (doc_id, source) — Spark side."""
    d = F.col("doc_id")
    # floor-div decorrelates k from source (source tracks doc_id % 20),
    # so canonical groups span sources x paths, not one path per source
    k = (F.floor(d / 20) % 10).cast("long").cast("string")
    scheme = F.when(d % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("http://"))
    host = F.when(
        d % 3 == 0, F.concat(F.upper(F.col("source")), F.lit(".Example.COM"))
    ).otherwise(F.concat(F.col("source"), F.lit(".example.com")))
    port = F.when(d % 5 == 0, F.lit(":80")).otherwise(F.lit(""))
    query = F.when(
        d % 2 == 0, F.concat(F.lit("?utm_source=feed&id="), k)
    ).otherwise(F.concat(F.lit("?id="), k, F.lit("&utm_campaign=x")))
    extra = F.when(d % 4 == 0, F.lit("&p=2")).otherwise(F.lit(""))
    frag = F.when(
        d % 3 == 1, F.concat(F.lit("#sec"), (d % 4).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, host, port, F.lit("/a/"), k, query, extra, frag)


# DuckDB twin of _messy_url_expr — byte-identical derivation
_MESSY_URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END)"
    " || (CASE WHEN doc_id % 3 = 0 THEN upper(source) || '.Example.COM'"
    "          ELSE source || '.example.com' END)"
    " || (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END)"
    " || '/a/' || ((doc_id // 20) % 10)::VARCHAR"
    " || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || ((doc_id // 20) % 10)::VARCHAR"
    "          ELSE '?id=' || ((doc_id // 20) % 10)::VARCHAR || '&utm_campaign=x' END)"
    " || (CASE WHEN doc_id % 4 = 0 THEN '&p=2' ELSE '' END)"
    " || (CASE WHEN doc_id % 3 = 1 THEN '#sec' || (doc_id % 4)::VARCHAR ELSE '' END)"
)


@register(
    "url_canonicalize",
    oracle=f"""
    SELECT doc_id, {_MESSY_URL_SQL} AS url,
           {canonical_url_sql(_MESSY_URL_SQL)} AS canon_url
    FROM documents
    ORDER BY doc_id
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url, canon_url): production canonicalization exprs over the
    derived messy URL. Narrow map, zero shuffle."""
    d = read_table(spark, sf_dir, "documents")
    url = _messy_url_expr()
    return d.select(
        "doc_id",
        url.alias("url"),
        canonical_url_expr(url).alias("canon_url"),
    )


# deterministic non-monotonic capture stamp, exact in int64 both engines
_CAPTURE_SQL = "(doc_id::BIGINT * 1000003) % 97"


def capture_rows(docs: DataFrame) -> DataFrame:
    """(canon_url, doc_id, capture) projection shared by the batch
    `dedup_url_latest` and the streaming upsert twin
    (streaming/url_latest_stream.py) — ONE definition of the capture stamp
    and URL identity, so the two can never silently diverge."""
    return docs.select(
        canonical_url_expr(_messy_url_expr()).alias("canon_url"),
        F.col("doc_id").cast("long").alias("doc_id"),
        ((F.col("doc_id").cast("long") * 1000003) % 97).alias("capture"),
    )


@register(
    "dedup_url_latest",
    oracle=f"""
    SELECT canon_url, doc_id, capture
    FROM (
      SELECT {canonical_url_sql(_MESSY_URL_SQL)} AS canon_url,
             doc_id, {_CAPTURE_SQL} AS capture
      FROM documents
    )
    QUALIFY row_number() OVER (
      PARTITION BY canon_url ORDER BY capture DESC, doc_id
    ) = 1
    ORDER BY canon_url, doc_id
    """,
)
def dedup_url_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-capture-wins URL dedup: one row per canonical URL, the row
    with the newest capture stamp (doc_id tie-break). The recrawl-refresh
    primitive that precedes content dedup."""
    rows = capture_rows(read_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("canon_url").orderBy(
        F.col("capture").desc(), F.col("doc_id")
    )
    return (
        rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("canon_url", "doc_id", "capture")
    )


@register(
    "host_blocklist",
    oracle=f"""
    SELECT host, count(*)::BIGINT AS n_docs
    FROM (
      SELECT {url_host_sql(canonical_url_sql(_MESSY_URL_SQL))} AS host
      FROM documents
    )
    WHERE host NOT IN {BLOCKED_HOSTS!r}
    GROUP BY host ORDER BY host
    """,
)
def host_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept docs per host after a broadcast anti-join against a blocklist
    dim (UT1-style). The corpus side never shuffles for the join."""
    d = read_table(spark, sf_dir, "documents")
    hosts = d.select(
        url_host_expr(canonical_url_expr(_messy_url_expr())).alias("host")
    )
    block = spark.createDataFrame(
        [(h,) for h in BLOCKED_HOSTS], ["host"]
    )
    return (
        hosts.join(F.broadcast(block), "host", "left_anti")
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("host")
    )
