"""Shared helpers for cross-engine-exact query twins."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """2-decimal money column → exact integer cents (sums become exact int64
    arithmetic, identical across Spark/DuckDB/pandas regardless of order)."""
    return F.round(col * 100, 0).cast("long")


def cents_sql(col: str) -> str:
    return f"CAST(round({col} * 100, 0) AS BIGINT)"


def r6(col: Column) -> Column:
    return F.round(col, 6)
