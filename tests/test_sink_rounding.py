"""The sink's metric rounding must equal Spark's F.round (HALF_UP over the
exact binary double), including at .x5 boundaries where Python's built-in
round() (HALF_EVEN) differs — ADVICE round 1."""

from __future__ import annotations

from pyspark.sql import functions as F

from isimip_qa_spark.plans.sink import _round4_half_up

# 2.00005 is actually 2.0000499999...755 in binary — both engines must agree
# on the *binary* value, not the decimal literal
BOUNDARY_VALUES = [
    0.00005, 0.00015, 2.00005, 2.00015, 1234.56785, -0.00005, -2.00015,
    0.123449999, 99.99995, 7.0, 0.0,
]


def test_round4_matches_spark_round(spark):
    df = spark.createDataFrame(
        [(v,) for v in BOUNDARY_VALUES], "v double"
    ).select(F.round("v", 4).alias("r"))
    spark_rounded = [r["r"] for r in df.collect()]
    ours = [_round4_half_up(v) for v in BOUNDARY_VALUES]
    assert ours == spark_rounded


def test_round4_differs_from_banker_rounding_somewhere():
    """Sanity: the fixture actually exercises a HALF_UP vs HALF_EVEN split
    (i.e. the old round() behaviour would have failed the test above)."""
    assert any(
        _round4_half_up(v) != round(v, 4) for v in BOUNDARY_VALUES
    )
