"""The DataFrameWriterV2 (`writeTo`) codepath — the Iceberg swap promised in
catalog.py.

The sandbox has no Iceberg (or any true V2) catalog: the session catalog
accepts V2 CTAS but not V2 appends ("Cannot write into v1 table"). So this
suite (a) runs the CREATE path for real against the session catalog and
reads the table back, and (b) pins the exact DataFrameWriterV2 call chain
each mode must issue via a recorder — on an Iceberg deployment those chains
are what commit snapshots/partition overwrites."""

from __future__ import annotations

import pytest

from isimip_qa_spark.catalog import write_table_v2

TBL = "qa_v2_test.metrics"


def _df(spark, chunk: int, vals):
    return spark.createDataFrame(
        [(chunk, int(v)) for v in vals], "chunk int, n long"
    )


def test_writeTo_create_real_roundtrip(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS qa_v2_test LOCATION '{tmp_path}/wh'")
    try:
        write_table_v2(
            _df(spark, 0, [1, 2]), TBL, mode="create", partition_by=["chunk"]
        )
        got = {(r["chunk"], r["n"]) for r in spark.table(TBL).collect()}
        assert got == {(0, 1), (0, 2)}
        # physically partitioned on chunk (partition pruning on reads):
        # DESCRIBE lists chunk once as a column and again under
        # "# Partition Information"
        desc = spark.sql(f"DESCRIBE TABLE {TBL}").toPandas()
        assert (desc["col_name"] == "# Partition Information").any()
        assert (desc["col_name"] == "chunk").sum() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {TBL}")
        spark.sql("DROP DATABASE IF EXISTS qa_v2_test")


class _Recorder:
    """Stands in for DataFrameWriterV2; records the fluent call chain."""

    def __init__(self, calls):
        self.calls = calls

    def partitionedBy(self, *cols):
        self.calls.append(("partitionedBy", len(cols)))
        return self

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def create(self):
        self.calls.append(("create",))

    def append(self):
        self.calls.append(("append",))

    def overwritePartitions(self):
        self.calls.append(("overwritePartitions",))


@pytest.mark.parametrize(
    "mode,partition_by,expected",
    [
        ("append", None, [("append",)]),
        (
            "create",
            ["chunk"],
            [("partitionedBy", 1), ("using", "parquet"), ("create",)],
        ),
        ("overwrite_partitions", None, [("overwritePartitions",)]),
    ],
)
def test_writeTo_call_chains(spark, mode, partition_by, expected):
    df = _df(spark, 0, [1])
    calls: list = []
    df.writeTo = lambda table: _Recorder(calls)  # noqa: E731
    write_table_v2(df, "iceberg.qa.metrics", mode=mode, partition_by=partition_by)
    assert calls == expected


def test_writeTo_bad_mode_raises(spark):
    df = _df(spark, 0, [1])
    df.writeTo = lambda table: _Recorder([])  # noqa: E731
    with pytest.raises(ValueError, match="unknown write_table_v2 mode"):
        write_table_v2(df, "iceberg.qa.metrics", mode="nope")
