"""CSV artifact sink/source twins (S8/S9): append mode + tolerant time."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from isimip_qa_spark.catalog import read_csv_series, write_csv_series

SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("var", T.DoubleType()),
    ]
)


def test_csv_roundtrip_append_and_tolerant_time(spark, tmp_path):
    path = str(tmp_path / "series_csv")
    a = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.5), ("2024-01-02 00:00:00", 2.5)],
        "time string, var double",
    ).select(F.to_timestamp("time").alias("time"), "var")
    write_csv_series(a, path)  # create
    b = spark.createDataFrame(
        [("2024-01-03 00:00:00", 3.5)], "time string, var double"
    ).select(F.to_timestamp("time").alias("time"), "var")
    write_csv_series(b, path)  # append (header-per-file, schema'd read)
    got = read_csv_series(spark, path, SCHEMA).orderBy("time").collect()
    assert [r["var"] for r in got] == [1.5, 2.5, 3.5]


def test_csv_malformed_time_dropped(spark, tmp_path):
    """The reference's OutOfBounds→NaT→drop semantics (extractions.py:67-84)."""
    path = str(tmp_path / "bad_csv")
    raw = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 1.0),
            ("not-a-time", 2.0),
            ("0000-99-99", 3.0),
        ],
        "time string, var double",
    )
    raw.write.option("header", True).csv(path)
    got = read_csv_series(spark, path, SCHEMA).collect()
    assert sorted(r["var"] for r in got) == [1.0]
