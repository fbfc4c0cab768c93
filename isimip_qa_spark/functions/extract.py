"""HTML → text extraction as pure column expressions.

The north-rule input table carries `html: binary` alongside the extracted
`text`; the per-row invariant every downstream stage depends on is
"byte-identical extracted text per url". This module makes that invariant
executable: `extract_text_expr(html)` recovers the text from the raw HTML
bytes entirely JVM-side (regexp_replace chain inside whole-stage codegen —
no Python, no Arrow crossing), and tests/test_extract.py asserts
extracted == text byte-for-byte over the pages source.

Extraction semantics (the trafilatura/jusText-lite contract, expressible as
regexes):
  1. drop <head>…</head> (title/meta are not document text),
  2. drop <script>…</script> and <style>…</style> blocks (their content is
     code, not text),
  3. strip every remaining tag,
  4. decode the five predefined XML entities — &amp; LAST, so literal
     "&amp;lt;" decodes to "&lt;" not "<".

All patterns are RE2-compatible (lazy quantifiers + inline (?is) flags
only) so the DuckDB oracle twin runs the byte-identical pattern set.

Scale shape: one projected scan of (url, html); html bytes never cross to
Python and never shuffle — extraction is a map-stage expression, exactly
like the reference's per-dataset assessment reads
(/root/reference/isimip_qa/mixins/extractions.py:42-62 compute-on-load).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order; identical strings on both engines
_BLOCK_PATTERNS = [
    (r"(?is)<head[^>]*>.*?</head>", ""),
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?s)<[^>]*>", ""),
]

# entity → char, in decode order (&amp; strictly last)
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def extract_text_expr(html: Column) -> Column:
    """binary html → extracted text (string), pure JVM expressions."""
    s = html.cast("string")  # binary → UTF-8 string
    for pat, rep in _BLOCK_PATTERNS:
        s = F.regexp_replace(s, pat, rep)
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def extract_text_sql(html_sql: str) -> str:
    """DuckDB twin: same pattern set, same order. DuckDB's regexp_replace
    replaces the FIRST match unless the 'g' option is passed; RE2 takes the
    (?is) flags inline exactly like Java."""
    s = html_sql
    for pat, _rep in _BLOCK_PATTERNS:
        p = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{p}', '', 'g')"
    for ent, ch in _ENTITIES:
        c = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{c}')"
    return s
