"""Bucketed co-located join evidence.

Several scale notes in this repo (versioning.py, dedup_incremental,
catalog V2 sink) claim: "at 100 TB the two tables are bucketed on the
same key, so the join is co-partitioned — zero exchange". This test
substantiates that claim on Spark's bucketed-table mechanism: two tables
written with bucketBy+sortBy on the join key join with NO Exchange (and
no sort) in the physical plan, while the same join over plain parquet
needs two exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    old = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("h_old")
    )
    new = spark.range(5_000, 15_000).select(
        F.col("id").alias("doc_id"), F.md5((F.col("id") * 7).cast("string")).alias("h_new")
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real join strategy decision (no broadcast shortcut)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        for name, df in (("t_old_b", old), ("t_new_b", new)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.bucketBy(8, "doc_id")
                .sortBy("doc_id")
                .mode("overwrite")
                .saveAsTable(name)
            )
        j = spark.table("t_old_b").join(spark.table("t_new_b"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout reused

        # control: plain parquet pays the shuffle
        po, pn = str(tmp_path / "po"), str(tmp_path / "pn")
        old.write.parquet(po)
        new.write.parquet(pn)
        jj = spark.read.parquet(po).join(spark.read.parquet(pn), "doc_id")
        plan2 = jj._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Exchange") >= 2

        # and the bucketed join's answer is right
        assert j.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS t_old_b")
        spark.sql("DROP TABLE IF EXISTS t_new_b")
