"""Writing-script composition + OCR-artifact rules (SURVEY.md §2.9 family).

Two per-document QA gates every large-scale web-text pipeline runs next to
language-ID, recast as zero-shuffle column expressions (reference anchor:
the per-dataset validity assertions in /root/reference/isimip_qa/
assessments/__init__.py — a per-row signal plus a keep decision):

- ``script_profile``: Unicode writing-script character composition
  (Latin / CJK / Cyrillic counts), the dominant script, and a
  script-vs-label consistency gate that also catches Cyrillic-homoglyph
  spoofing inside Latin text (the classic ``е``-for-``e`` confusable).
- ``ocr_artifact_rules``: hyphenated line-break and degenerate-short-line
  fractions over the page's line structure — the standard OCR/extraction
  damage signals.

The synthetic corpus is single-script ASCII, so — exactly like
``encoding_quality``'s mojibake plant and ``c4_line_clean``'s line
decorator — each query first builds a deterministic multi-script /
damaged page from (doc_id, lang, text) with engine-portable expressions
(``translate`` is character-wise in both Spark and DuckDB; regex character
classes are written with literal Unicode endpoints so the same pattern
string is valid Java-regex and RE2). Both gates use integer-only
comparisons so the keep booleans are engine-exact.

At 100 TB both queries stay a single projection over the scan: no
exchange, no Python, no UDF — they widen the existing whole-stage-codegen
span of whatever pipeline stage hosts them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from . import register
from .curation import _segs_cte, segments_expr

# --- script_profile --------------------------------------------------------

# translate() source/target pairs: high-frequency Latin letters → common
# CJK chars (zh-labelled docs), and the Cyrillic homoglyph confusables
# planted into every 13th non-zh doc. Character-wise in both engines.
_ZH_SRC = "etaoinsrhl"
_ZH_DST = "的一是不了人在有我他"
_HOMO_SRC = "aeo"
_HOMO_DST = "аео"  # Cyrillic а е о — Latin lookalikes

# Regex character classes with literal Unicode endpoints (portable:
# Java regex and RE2 both accept the raw characters inside [x-y]).
_LATIN_CLASS = "[A-Za-z]"
_CJK_CLASS = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"
_CYR_CLASS = f"[{chr(0x0400)}-{chr(0x04FF)}]"


def _script_plant_expr(text: Column) -> Column:
    return (
        F.when(F.col("lang") == "zh", F.translate(text, _ZH_SRC, _ZH_DST))
        .when(
            F.pmod(F.col("doc_id"), F.lit(13)) == 0,
            F.translate(text, _HOMO_SRC, _HOMO_DST),
        )
        .otherwise(text)
    )


def _script_plant_sql() -> str:
    return (
        "CASE WHEN lang = 'zh'"
        f" THEN translate(text, '{_ZH_SRC}', '{_ZH_DST}')"
        " WHEN doc_id % 13 = 0"
        f" THEN translate(text, '{_HOMO_SRC}', '{_HOMO_DST}')"
        " ELSE text END"
    )


def _class_count(p: Column, cls: str) -> Column:
    # the repo's established class-count idiom (textstats.py): one
    # regexp_count per class, codepoint-identical in Spark and DuckDB's
    # twin below for BMP classes like these.
    return F.regexp_count(p, F.lit(cls)).cast("long")


def _class_count_sql(p: str, cls: str) -> str:
    return f"len(regexp_extract_all({p}, '{cls}'))::BIGINT"


_SCRIPT_SQL = f"""
    WITH p AS (
      SELECT doc_id, lang, {_script_plant_sql()} AS page FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
             length(page)::BIGINT AS n_chars,
             {_class_count_sql("page", _LATIN_CLASS)} AS latin_n,
             {_class_count_sql("page", _CJK_CLASS)} AS cjk_n,
             {_class_count_sql("page", _CYR_CLASS)} AS cyr_n
      FROM p
    ),
    d AS (
      SELECT *,
             CASE WHEN latin_n >= cjk_n AND latin_n >= cyr_n THEN 'latin'
                  WHEN cjk_n >= cyr_n THEN 'cjk'
                  ELSE 'cyr' END AS dominant_script,
             CASE WHEN lang = 'zh' THEN 'cjk' ELSE 'latin' END
               AS expected_script
      FROM c
    )
    SELECT doc_id, lang, n_chars, latin_n, cjk_n, cyr_n,
           dominant_script, expected_script,
           (dominant_script = expected_script)
           AND (lang = 'zh' OR cyr_n = 0) AS script_keep
    FROM d
"""


@register("script_profile", oracle=_SCRIPT_SQL)
def script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_chars, latin_n, cjk_n, cyr_n, dominant_script,
    expected_script, script_keep) over the planted multi-script page.

    ``script_keep`` is the langid sanity gate: the dominant script must
    match the script the language label implies, and non-zh pages must
    contain zero Cyrillic codepoints — any Cyrillic inside Latin text is
    homoglyph spoofing, not legitimate content. One projection, no
    exchange, no Python.
    """
    d = read_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", "lang", _script_plant_expr(F.col("text")).alias("page")
    )
    p = F.col("page")
    counts = staged.select(
        "doc_id",
        "lang",
        F.length(p).cast("long").alias("n_chars"),
        _class_count(p, _LATIN_CLASS).alias("latin_n"),
        _class_count(p, _CJK_CLASS).alias("cjk_n"),
        _class_count(p, _CYR_CLASS).alias("cyr_n"),
    )
    lat, cjk, cyr = F.col("latin_n"), F.col("cjk_n"), F.col("cyr_n")
    dominant = (
        F.when((lat >= cjk) & (lat >= cyr), F.lit("latin"))
        .when(cjk >= cyr, F.lit("cjk"))
        .otherwise(F.lit("cyr"))
    )
    expected = F.when(F.col("lang") == "zh", F.lit("cjk")).otherwise(
        F.lit("latin")
    )
    return counts.select(
        "doc_id",
        "lang",
        "n_chars",
        "latin_n",
        "cjk_n",
        "cyr_n",
        dominant.alias("dominant_script"),
        expected.alias("expected_script"),
        (
            (dominant == expected)
            & ((F.col("lang") == "zh") | (cyr == F.lit(0)))
        ).alias("script_keep"),
    )


# --- ocr_artifact_rules ----------------------------------------------------

OCR_LINE_W = 8  # tokens per planted line
_SHORT_LEN = 15  # a line under this many chars is "degenerate short"
# integer-exact gate thresholds: hyphen-broken lines ≤ 1/4 of lines,
# short lines ≤ 1/3 of lines
_HYPH_DEN = 4
_SHORT_DEN = 3


def _ocr_decorate(seg: Column, i: Column) -> Column:
    m = F.pmod(F.lit(37) * F.col("doc_id") + i, F.lit(6))
    return (
        F.when(m == 0, F.concat(seg, F.lit("-")))  # OCR hyphen break
        .when(m == 1, F.lit("x"))  # degenerate short line
        .otherwise(seg)
    )


_OCR_SQL = f"""
    WITH {_segs_cte(w=OCR_LINE_W, idx="i::BIGINT AS i,")},
    lines AS (
      SELECT doc_id,
             CASE ((37 * doc_id + i) % 6)
               WHEN 0 THEN seg || '-'
               WHEN 1 THEN 'x'
               ELSE seg END AS line
      FROM segs
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_lines,
           sum(CASE WHEN line LIKE '%-' THEN 1 ELSE 0 END)::BIGINT
             AS hyph_n,
           sum(CASE WHEN length(line) < {_SHORT_LEN} THEN 1 ELSE 0 END)
             ::BIGINT AS short_n,
           sum(length(line))::BIGINT AS len_sum,
           (sum(CASE WHEN line LIKE '%-' THEN 1 ELSE 0 END) * {_HYPH_DEN}
              <= count(*))
           AND (sum(CASE WHEN length(line) < {_SHORT_LEN} THEN 1 ELSE 0 END)
                  * {_SHORT_DEN} <= count(*)) AS ocr_keep
    FROM lines GROUP BY doc_id
"""


@register("ocr_artifact_rules", oracle=_OCR_SQL)
def ocr_artifact_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_lines, hyph_n, short_n, len_sum, ocr_keep): OCR /
    extraction-damage signals over the deterministically damaged
    multi-line page — hyphenated line breaks ('-'-terminated lines, the
    OCR de-hyphenation signal) and degenerate short lines.

    All per-line work happens inside array higher-order functions on the
    already-materialised line array, so the whole query is one projection
    per row — no explode, no exchange, no Python. The keep gate compares
    integers only (hyph_n·4 ≤ n_lines, short_n·3 ≤ n_lines) so it is
    engine-exact.
    """
    d = read_table(spark, sf_dir, "documents")
    lines = F.transform(
        segments_expr(F.col("text"), OCR_LINE_W), _ocr_decorate
    )
    staged = d.select("doc_id", lines.alias("lines"))
    arr = F.col("lines")
    counted = staged.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_lines"),
        F.size(F.filter(arr, lambda x: x.endswith("-")))
        .cast("long")
        .alias("hyph_n"),
        F.size(F.filter(arr, lambda x: F.length(x) < _SHORT_LEN))
        .cast("long")
        .alias("short_n"),
        F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("len_sum"),
    )
    return counted.select(
        "doc_id",
        "n_lines",
        "hyph_n",
        "short_n",
        "len_sum",
        (
            (F.col("hyph_n") * _HYPH_DEN <= F.col("n_lines"))
            & (F.col("short_n") * _SHORT_DEN <= F.col("n_lines"))
        ).alias("ocr_keep"),
    )
