"""Mixing operators: plan shape + greedy-budget property at sf0.001."""

from __future__ import annotations

from isimip_qa_spark.queries.mixing import (
    TOKEN_BUDGET,
    deterministic_sample,
    token_budget_per_source,
)

SF = "/root/testdata/sf0.001"


def test_sample_is_shuffle_free_and_stable(spark):
    df = deterministic_sample(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # predicate evaluates in the scan stage
    a = sorted(r["doc_id"] for r in df.collect())
    b = sorted(r["doc_id"] for r in deterministic_sample(spark, SF).collect())
    assert a == b and len(a) > 0  # seedless → identical across runs


def test_token_budget_greedy_property(spark):
    rows = token_budget_per_source(spark, SF).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    from isimip_qa_spark.queries.webtext import QUALITY_SQL

    full = con.execute(
        f"""
        SELECT doc_id, source, len(string_split(text, ' ')) AS ws,
               {QUALITY_SQL} AS q
        FROM documents ORDER BY source, q DESC, doc_id
        """
    ).fetchall()
    kept = {r["doc_id"] for r in rows}
    order: dict[str, list] = {}
    for d, s, w, q in full:
        order.setdefault(s, []).append((d, w))
    for src, docs in order.items():
        rs = by_src.get(src, [])
        total = sum(r["ws_tokens"] for r in rs)
        assert total <= TOKEN_BUDGET
        if rs:
            assert max(r["cum_tokens"] for r in rs) == total
        # kept set is exactly the maximal quality-ordered prefix under budget
        cum, prefix = 0, set()
        for d, w in docs:
            cum += w
            if cum > TOKEN_BUDGET:
                break
            prefix.add(d)
        assert prefix == {r["doc_id"] for r in rs}


def test_domain_mix_weights(spark, sf_dir):
    """alpha-tempering flattens: head domains lose share, tail domains
    gain; weights form a distribution; ordering by share is preserved."""
    from isimip_qa_spark.queries.mixing import domain_mix_weights

    rows = sorted(
        domain_mix_weights(spark, sf_dir).collect(),
        key=lambda r: -r["token_share"],
    )
    assert len(rows) >= 2
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    head, tail = rows[0], rows[-1]
    assert head["token_share"] > tail["token_share"]
    assert head["mix_weight"] < head["token_share"]
    assert tail["mix_weight"] > tail["token_share"]
    # monotone: p^alpha preserves the share ordering
    ws = [r["mix_weight"] for r in rows]
    assert ws == sorted(ws, reverse=True)
