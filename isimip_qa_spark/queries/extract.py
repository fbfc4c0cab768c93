"""HTML→text extraction query: the north-rule byte-identity invariant.

The input table's `html: binary` column is the raw capture; `text` is the
extracted text every downstream stage consumes. This query runs the real
extraction expression chain (functions/extract.py — head/script/style
removal, tag strip, entity decode, all JVM-side) against an
independently-constructed HTML document and returns the extracted text, so
the DuckDB twin (RE2 running the byte-identical pattern set) pins the
extraction semantics cross-engine. tests/test_extract.py additionally
asserts extracted == text byte-for-byte over the pages source's real
`html` column — the executable form of "byte-identical extracted text per
url".

The constructed HTML exercises every rule: a <head> with <title> and
<style> (dropped whole), a <script> inside <body> (dropped whole), an
entity-bearing paragraph (&amp;/&lt;/&gt;/&quot; decode), and attributes
on tags (stripped). documents.text rides in the body unchanged, so the
expected output is the entity-decoded intro + the original text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..functions.extract import extract_text_expr, extract_text_sql
from . import register

# the entity-decoded form of _INTRO below
_INTRO = (
    '<p class="intro">links &amp; quotes: &quot;a&quot; &lt;raw&gt; </p>'
)

_HTML_SQL = (
    "'<html><head><title>d' || doc_id::VARCHAR || '</title>"
    "<style>p{color:red}</style></head>"
    "<body><script type=\"text/javascript\">var x = 1 < 2;</script>"
    + _INTRO.replace("'", "''")
    + "' || text || '</body></html>'"
)

_EXTRACT_SQL = f"""
    SELECT doc_id,
           {extract_text_sql(_HTML_SQL)} AS extracted
    FROM documents
    ORDER BY doc_id
"""


@register("extract_text", _EXTRACT_SQL)
def extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, extracted): text recovered from a constructed raw-HTML
    binary by the production extraction expressions."""
    docs = read_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>d"),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{color:red}</style></head>"),
        F.lit('<body><script type="text/javascript">var x = 1 < 2;</script>'),
        F.lit(_INTRO),
        F.col("text"),
        F.lit("</body></html>"),
    ).cast("binary")
    return (
        docs.select(
            "doc_id", extract_text_expr(html).alias("extracted")
        )
    )
