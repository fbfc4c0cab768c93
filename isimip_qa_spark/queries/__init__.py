"""Registry of (Spark query, DuckDB oracle SQL) pairs.

Each query is a callable `(spark, sf_dir) -> DataFrame` registered together
with an ANSI-SQL twin the driver runs via DuckDB over the same parquet
tables. Column names and value semantics are part of the contract: every
computed column is aliased identically on both sides, and float aggregates
are made engine-exact where possible (integer-cents sums, dyadic logprobs)
or defensively rounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_loaded = False


def load_all() -> None:
    """Import all query modules (idempotent)."""
    global _loaded
    if _loaded:
        return
    from . import (  # noqa: F401
        ann,
        bloom,
        curation,
        datasheet,
        decontaminate,
        dedup,
        dsir,
        evaluation,
        extract,
        extras,
        graph,
        layout,
        lm,
        mixing,
        packing,
        reference_ops,
        retrieval,
        scriptid,
        selection,
        substring,
        textmodel,
        training_prep,
        urlops,
        versioning,
        webtext,
    )

    _loaded = True
