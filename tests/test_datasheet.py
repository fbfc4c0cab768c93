"""corpus_datasheet / doclen_histogram: semantic invariants + plan shape
(one scan, label-as-expression, tiny hash aggs)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_datasheet_volumes_and_keep_rate(spark):
    from isimip_qa_spark.functions import textstats as ts
    from isimip_qa_spark.queries.datasheet import corpus_datasheet

    rows = corpus_datasheet(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    # keep totals agree with the production rule applied directly
    n_keep_direct = docs.filter(ts.keep_expr(F.col("text"))).count()
    assert sum(r.n_keep for r in rows) == n_keep_direct
    for r in rows:
        assert r.keep_rate == r.n_keep / r.n_docs
        assert r.mean_doc_tokens == r.n_tokens / r.n_docs


def test_datasheet_plan_one_scan_no_join(spark):
    from isimip_qa_spark.queries.datasheet import corpus_datasheet

    plan = plan_of(corpus_datasheet(spark, SF))
    assert plan.count("FileScan") == 1  # keep label is an expression
    assert "Join" not in plan
    assert "partial_sum" in plan  # map-side collapse before the exchange


def test_doclen_buckets_partition_the_corpus(spark):
    from isimip_qa_spark.functions import textstats as ts
    from isimip_qa_spark.queries.datasheet import doclen_histogram

    rows = doclen_histogram(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        # bucket b covers [2^(b-1), 2^b - 1]
        assert r.lo_tokens == 1 << (r.bucket - 1)
        assert r.hi_tokens == (1 << r.bucket) - 1
    # bucket assignment matches a direct count inside one bucket's range
    mid = rows[len(rows) // 2]
    n = docs.filter(
        (F.size(ts.tokens_expr(F.col("text"))) >= mid.lo_tokens)
        & (F.size(ts.tokens_expr(F.col("text"))) <= mid.hi_tokens)
    ).count()
    assert n == mid.n_docs


def test_vocab_growth_curve(spark, sf_dir):
    """Monotone curve, exact totals, sublinear type growth (Heaps), and
    the plan never windows over corpus rows."""
    import duckdb

    from isimip_qa_spark.queries.datasheet import DECILES, vocab_growth

    df = vocab_growth(spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, DECILES + 1))
    toks = [r["cum_tokens"] for r in rows]
    typs = [r["cum_types"] for r in rows]
    assert toks == sorted(toks) and typs == sorted(typs)
    con = duckdb.connect()
    tot = con.execute(
        "SELECT sum(len(string_split(text,' ')))::BIGINT "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    dis = con.execute(
        "SELECT count(DISTINCT w) FROM (SELECT unnest(string_split(text,' ')) w "
        f"FROM read_parquet('{sf_dir}/documents.parquet'))"
    ).fetchone()[0]
    assert toks[-1] == tot and typs[-1] == dis
    # types grow slower than occurrences over the back half (Heaps)
    assert (typs[-1] - typs[4]) < (toks[-1] - toks[4])
