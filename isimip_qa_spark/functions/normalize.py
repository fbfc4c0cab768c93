"""Unicode text normalization: NFC composition + control-char strip +
whitespace collapse — the text-canonicalization step that runs before any
hashing/fingerprinting stage (two byte-different encodings of the same
glyphs must dedup together).

Split by engine affinity: NFC needs a table-driven kernel, so it is an
Arrow-batched pandas UDF (pandas `Series.str.normalize` — vectorized C
path, never per-row Python); the strip/collapse steps are pure JVM
`regexp_replace` exprs that stay inside whole-stage codegen. The DuckDB
twin is `nfc_normalize` + the same two patterns (RE2 needs the 'g' flag;
Spark's regexp_replace is global by default).

Reference anchor: isimip_qa/models.py:55-61 normalises nonstandard
time encodings into one canonical calendar before any grouping; this is
the text-payload analogue (canonical bytes before identity ops).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_RE = r"[ \t\r\n]+"


def nfc_udf(col: Column) -> Column:
    """Arrow-batched NFC composition (lazy UDF creation — module import
    must stay executor-safe, see functions/perplexity.py)."""
    def _nfc(s):
        return s.str.normalize("NFC")

    return F.pandas_udf(_nfc, "string")(col)


def normalize_text_expr(text: Column) -> Column:
    """Control strip → NFC → whitespace collapse → trim.

    Control chars are stripped BEFORE composition on both engines: DuckDB's
    `nfc_normalize` returns '' outright for strings that start with NUL and
    contain any non-ASCII char (utf8proc quirk, caught by
    tests/test_twin_property.py), so the twins only stay byte-identical if
    neither side ever feeds NUL into NFC. NFC itself never emits control
    chars, so nothing needs a second strip."""
    x = F.regexp_replace(text, _CTRL_RE, "")
    x = nfc_udf(x)
    x = F.regexp_replace(x, _WS_RE, " ")
    return F.trim(x)


def normalize_text_sql(text_sql: str) -> str:
    """DuckDB twin — byte-identical output. NB trim(x, ' '): DuckDB's
    one-arg trim strips ALL Unicode whitespace (NBSP, U+3000, …) where
    Spark's trims only ASCII space — a leading NBSP diverged the twins
    (caught by tests/test_twin_property.py)."""
    return (
        f"trim(regexp_replace(nfc_normalize(regexp_replace({text_sql},"
        f" '{_CTRL_RE}', '', 'g')), '{_WS_RE}', ' ', 'g'), ' ')"
    )
