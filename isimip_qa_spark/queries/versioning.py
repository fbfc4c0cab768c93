"""Crawl-snapshot versioning: diff two crawl versions of the same corpus.

A production pipeline re-ingests a crawl every few weeks and needs the
version-over-version report — how many pages appeared, vanished, changed
content, or stayed byte-identical, per source/host — before deciding what
downstream work (re-dedup, re-scoring) the delta actually requires. The
reference's analogue is its artifact-cache skip decision (recompute only
what changed; isimip_qa/main.py:126-128 exists()/fetch() gating); here the
"what changed" question is answered corpus-to-corpus.

Two deterministic snapshots are derived from the `documents` table with
pure predicates (no external data, identical in both engines):

  old  = docs with doc_id % 11 != 3               (pages in the previous crawl)
  new  = docs with doc_id % 13 != 5, where pages  (pages in the current crawl)
         with doc_id % 17 == 2 were re-crawled with changed content

Content comparison is by md5 digest (both engines hash the UTF-8 bytes and
print lowercase hex): only (doc_id, source, 16-byte digest) ever enters the
join — the text itself never shuffles. At 100 TB the two snapshots are two
Iceberg tables bucketed on the same url-hash key, so the full-outer join is
co-partitioned (zero exchange); unbucketed inputs pay one 8-byte-keyed
shuffle per side, never a text shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from . import register

_OLD_PRED = "doc_id % 11 != 3"
_NEW_PRED = "doc_id % 13 != 5"
_CHANGED_PRED = "doc_id % 17 = 2"
_UPDATE_MARK = " [updated]"


_DIFF_SQL = f"""
    WITH old AS (
      SELECT doc_id, source, md5(text) AS h
      FROM documents WHERE {_OLD_PRED}
    ),
    new AS (
      SELECT doc_id, source,
             md5(CASE WHEN {_CHANGED_PRED} THEN text || '{_UPDATE_MARK}'
                      ELSE text END) AS h
      FROM documents WHERE {_NEW_PRED}
    ),
    j AS (
      SELECT coalesce(o.source, n.source) AS source,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.h != n.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT source, status, count(*)::BIGINT AS n_docs
    FROM j GROUP BY source, status
    ORDER BY source, status
"""


@register("snapshot_diff", _DIFF_SQL)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, status) page counts between two crawl snapshots.

    status ∈ {added, removed, changed, unchanged}; `changed` means the page
    exists in both snapshots with different content digests.

    Scale shape: each snapshot is projected to (doc_id, source, md5) at the
    scan — the digest is computed map-side, so the full-outer join carries
    ~40 bytes/row regardless of document size. Join key is the 8-byte page
    id; the final rollup is a tiny hash agg (sources × 4 statuses)."""
    d = read_table(spark, sf_dir, "documents")
    digest = F.md5(F.col("text").cast("binary"))
    old = d.filter(F.expr(_OLD_PRED)).select(
        "doc_id", "source", digest.alias("h")
    )
    new_text = F.when(
        F.expr(_CHANGED_PRED), F.concat(F.col("text"), F.lit(_UPDATE_MARK))
    ).otherwise(F.col("text"))
    new = d.filter(F.expr(_NEW_PRED)).select(
        "doc_id", "source", F.md5(new_text.cast("binary")).alias("h")
    )
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    status = (
        F.when(F.col("o.doc_id").isNull(), F.lit("added"))
        .when(F.col("n.doc_id").isNull(), F.lit("removed"))
        .when(F.col("o.h") != F.col("n.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("o.source"), F.col("n.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "status")
    )
