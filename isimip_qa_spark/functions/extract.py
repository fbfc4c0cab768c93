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

from .urlops import url_host_expr, url_host_sql

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


# ---------------------------------------------------------------------------
# Outlink extraction: the href → destination-host map that turns raw HTML
# into the link graph queries/graph.py ranks. Same two-engine discipline
# as the text extraction above — one RE2-compatible pattern set, Spark
# expressions and a DuckDB twin built from the identical strings.
#
# Semantics: every href value (single- or double-quoted, any attribute
# case) is resolved to a destination HOST — absolute http(s) URLs through
# the urlops host extraction (lowercased, port-free), anything else
# (relative paths, fragments) to the page's own host, which is what a
# host-granular link graph wants from a relative link. Non-http schemes
# (mailto:, javascript:) resolve to the base host too; a production
# pipeline that wants them dropped filters the output — the graph builder
# aggregates per (src, dst) so the self-edge they produce is the
# honest host-level reading of "links to itself or nowhere".
# ---------------------------------------------------------------------------

def nocase(lit: str) -> str:
    """Case-insensitive literal via explicit per-letter classes.

    `(?i)` folds ASCII-only in Java regex but Unicode-wide in RE2/DuckDB —
    input containing fold-variant codepoints (U+017F long-s → s, U+212A
    Kelvin → k, dotless/dotted i → i) inside a tag literal would match on
    one engine and not the other. Explicit [Aa]-style classes have
    identical semantics in Java, RE2, and Python, so every head-tag
    pattern in the repo is built through this helper instead of (?i).

    Non-alphabetic characters are backslash-escaped (digits and '_'
    excepted — never special) so a literal containing a regex
    metacharacter (. ? -) stays a literal; '\\.' '\\-' etc. quote the
    character identically in Java regex, RE2, and Python."""
    return "".join(
        f"[{c.upper()}{c.lower()}]"
        if c.isalpha()
        else (c if c.isdigit() or c == "_" else "\\" + c)
        for c in lit
    )


_HREF_RE = nocase("href") + "=[\"']([^\"']*)[\"']"
_ABS_RE = "^" + nocase("http") + "[Ss]?://"


def extract_link_hosts_expr(html: Column, base_host: Column) -> Column:
    """array<string> of destination hosts for every href in `html`
    (binary or string); relative links resolve to `base_host`."""
    urls = F.regexp_extract_all(
        html.cast("string"), F.lit(_HREF_RE), F.lit(1)
    )
    return F.transform(
        urls,
        lambda u: F.when(u.rlike(_ABS_RE), url_host_expr(u)).otherwise(
            base_host
        ),
    )


def extract_link_hosts_sql(html_sql: str, base_host_sql: str) -> str:
    """DuckDB twin of extract_link_hosts_expr."""
    href = _HREF_RE.replace("'", "''")
    abs_ = _ABS_RE.replace("'", "''")
    urls = f"regexp_extract_all({html_sql}, '{href}', 1)"
    return (
        f"list_transform({urls}, u -> CASE WHEN regexp_matches(u, '{abs_}')"
        f" THEN {url_host_sql('u')} ELSE {base_host_sql} END)"
    )
