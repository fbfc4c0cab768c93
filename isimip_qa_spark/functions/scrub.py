"""Compiled-regex PII/toxicity scrubbing.

Two backends with the byte-identity rule from SURVEY.md §7: any pattern that
must match the pandas oracle byte-for-byte runs in the *same* engine — the
Arrow pandas UDF uses precompiled Python `re` (identical to the oracle by
construction); the column-expression backend (`regexp_replace` chains, Java
regex JVM-side) is restricted to patterns whose semantics agree across
Java/RE2/Python (plain character classes, no unicode classes, no
lookaround), verified by tests/test_qa_pipeline.py.

Patterns are applied in list order; order matters (emails before bare
domains would, e.g., double-scrub).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — engine-portable subset: char classes + bounded reps.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]

# toxicity term list (placeholder lexicon; swap for a real one in deployment)
TOXIC_TERMS = ["badword1", "badword2", "slur1"]
TOXIC_PATTERN = "(?:" + "|".join(TOXIC_TERMS) + ")"

ALL_PATTERNS = PII_PATTERNS + [(TOXIC_PATTERN, "<TOXIC>")]

_COMPILED = [(re.compile(p), r) for p, r in ALL_PATTERNS]


def scrub_expr(text: Column) -> Column:
    """JVM-side chain of regexp_replace (fast path, engine-portable subset)."""
    out = text
    for pat, repl in ALL_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def _scrub_series(texts: pd.Series) -> pd.Series:
    out = texts
    for rx, repl in _COMPILED:
        out = out.str.replace(rx, repl, regex=True)
    return out


def scrub_udf(text: Column) -> Column:
    """Python-`re` backend: byte-identical to the pandas oracle (lazily
    created pandas UDF)."""
    return F.pandas_udf(_scrub_series, "string")(text)


def scrub_oracle_sql(col: str) -> str:
    """The same chain as nested DuckDB regexp_replace (global flag)."""
    expr = col
    for pat, repl in ALL_PATTERNS:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', 'g')"
    return expr
