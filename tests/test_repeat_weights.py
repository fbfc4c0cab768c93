"""Repeat-count downweighting: mass-per-cluster invariants on the sf
corpus and parity with the registered DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd

from isimip_qa_spark.queries.selection import repeat_weights
from isimip_qa_spark.queries import ORACLES, load_all


def test_invariants(spark, sf_dir):
    pdf = repeat_weights(spark, sf_dir).toPandas()
    # one row per document
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(pdf) == n_docs
    assert pdf["doc_id"].is_unique
    # singletons keep weight 1; members weigh 1/k
    singles = pdf[pdf["cluster_size"] == 1]
    assert (singles["weight"] == 1.0).all()
    assert (pdf["weight"] == round(1.0 / pdf["cluster_size"], 6)).all()
    # the fixture plants near-duplicates: some cluster must be non-trivial
    assert (pdf["cluster_size"] > 1).any()
    # every cluster contributes total mass 1 (pre-rounding): summed per
    # cluster-size bucket, k members of weight 1/k give count/k clusters
    grp = pdf.groupby("cluster_size")["weight"].agg(["count", "sum"])
    for k, row in grp.iterrows():
        assert abs(row["sum"] - row["count"] / k) < 1e-3


def test_oracle_parity(spark, sf_dir):
    load_all()
    got = (
        repeat_weights(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(ORACLES["repeat_weights"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
