"""URL canonicalization expressions — pure JVM column exprs with exact
DuckDB twins (same pattern as functions/extract.py: one pattern set, two
regex engines, semantics pinned by the oracle).

A crawl pipeline's first identity question is "which captures are the same
page?", and the answer starts with a canonical URL:

  0. remove ASCII tab/CR/LF anywhere in the string (the WHATWG URL parser
     strips them before parsing; crawls really do emit header-wrapped
     URLs) — this also keeps the `$`-anchored steps engine-portable,
     because Java's `$` matches before a trailing newline while RE2's
     matches only end-of-string,
  1. strip the fragment (`#...` never reaches the server),
  2. lowercase the scheme and authority (case-insensitive per RFC 3986),
  3. drop the scheme's default port (`:80` for http, `:443` for https),
  4. drop tracking query params (utm_*, fbclid, gclid, msclkid, ref) and
     empty params, sort the survivors bytewise (param order is almost
     never semantic; sorting makes equal pages equal strings),
  5. normalise an empty path to `/`.

Percent-encoding normalisation and IDN/punycode folding are documented
non-goals here: both need tables (the unreserved set, IDNA mappings) that
belong in a dedicated kernel, and neither changes the join/shuffle shape
this module exists to pin down.

Cross-engine notes: every pattern avoids lookaround (RE2 has none), Spark
backreferences are `$1` while DuckDB's are `\\1` (parameterised below),
Spark's higher-order `filter`/`transform` mirror DuckDB's `list_filter`/
`list_transform`, and both engines' default array sort is ascending
bytewise on ASCII, so step 4's order is identical.

Reference anchor: the reference normalises dataset *paths* to a canonical
identity before globbing (isimip_qa/config.py:38-65 lower-cases formatted
path templates); this is the web-corpus analogue where the identity is a
URL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# authority = everything between :// and the first /, ? or #
_PREFIX_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
_TRACK_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]*)"


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of `url` (steps 0-5 above), Spark side."""
    u = F.regexp_replace(url, r"[\t\r\n]", "")
    u = F.regexp_replace(u, r"#.*$", "")
    prefix = F.lower(F.regexp_extract(u, _PREFIX_RE, 1))
    rest = F.substring(u, F.length(prefix) + 1, F.lit(2**30))
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]+):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]+):443$", "$1")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(
        F.length(rest) > F.length(path),
        F.substring(rest, F.length(path) + 2, F.lit(2**30)),
    ).otherwise(F.lit(""))
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda x: (x != "") & ~x.rlike(_TRACK_RE),
            )
        ),
        "&",
    )
    return F.concat(
        prefix,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def canonical_url_sql(url_sql: str) -> str:
    """DuckDB twin of canonical_url_expr — byte-identical output."""
    # 'g': DuckDB regexp_replace is first-match-only by default where
    # Spark's is global
    u0 = f"regexp_replace({url_sql}, '[\\t\\r\\n]', '', 'g')"
    u = f"regexp_replace({u0}, '#.*$', '')"
    prefix = f"lower(regexp_extract({u}, '{_PREFIX_RE}', 1))"
    rest = f"substr({u}, length({prefix}) + 1)"
    prefix = (
        f"regexp_replace(regexp_replace({prefix},"
        f" '^(http://[^/:]+):80$', '\\1'),"
        f" '^(https://[^/:]+):443$', '\\1')"
    )
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    query = (
        f"CASE WHEN length({rest}) > length({path})"
        f" THEN substr({rest}, length({path}) + 2) ELSE '' END"
    )
    kept = (
        # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
        # array_join([]) is '' — without it every no-query URL canonicalizes
        # to NULL (caught by tests/test_twin_property.py)
        f"coalesce(array_to_string(list_sort(list_filter(string_split({query}, '&'),"
        f" x -> x <> '' AND NOT regexp_matches(x, '{_TRACK_RE}'))), '&'), '')"
    )
    return (
        f"{prefix} || (CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
        f" || (CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END)"
    )


def url_host_expr(url: Column) -> Column:
    """Lowercased host (no port) of `url`. Works on raw or canonical URLs;
    applies the same step-0 tab/CR/LF strip so raw and canonical inputs
    yield the same host."""
    u = F.regexp_replace(url, r"[\t\r\n]", "")
    return F.regexp_extract(F.lower(u), _HOST_RE, 1)


def url_host_sql(url_sql: str) -> str:
    u = f"regexp_replace({url_sql}, '[\\t\\r\\n]', '', 'g')"
    return f"regexp_extract(lower({u}), '{_HOST_RE}', 1)"
