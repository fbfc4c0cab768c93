"""Physical-layout operators surfaced as queries (the computable part of
table maintenance — the side-effecting compaction/rewrite lives in
plans/maintenance.py and functions/zorder.py with pytest coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions.zorder import zorder_key_expr, zorder_key_sql
from . import register

_TOKS = "string_split(text, ' ')"


@register(
    "zorder_key",
    oracle=f"""
    SELECT doc_id,
           {zorder_key_sql("n_chars", f"len({_TOKS})")} AS zkey
    FROM documents
    """,
)
def zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (n_chars, n_tokens) — the clustering key
    `write_zordered` lays files out by; exact cross-engine bit math."""
    d = read_table(spark, sf_dir, "documents")
    z = zorder_key_expr(F.col("n_chars"), F.size(F.split(F.col("text"), " ")))
    return d.select("doc_id", z.alias("zkey"))
