"""Fuzzy (near-dup) decontamination: planted paraphrase that dodges the
exact 13-gram check but not the shingle-Jaccard check; plan shape."""

from __future__ import annotations

from isimip_qa_spark.queries.decontaminate import (
    EVAL_MOD,
    FUZZY_THRESHOLD,
    decontaminate,
    decontaminate_fuzzy,
)

SF = "/root/testdata/sf0.01"


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "planted", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(path / "documents.parquet"))


def test_planted_paraphrase_caught_by_fuzzy_not_exact(spark, tmp_path):
    # 66 unique words; paraphrase substitutes every 13th word → longest
    # shared run is 12 words (no shared 13-gram), but only 3 of every 13
    # 3-shingles die → Jaccard = 10/13 / (2 − 10/13) = 0.625 ≥ threshold
    words = [f"w{i}" for i in range(66)]
    bench = " ".join(words)
    para_words = list(words)
    for i in range(6, 66, 13):
        para_words[i] = f"x{i}"
    paraphrase = " ".join(para_words)
    unrelated = "completely different text about spark shuffle partitions and codegen"
    rows = [(0, bench)]  # doc 0 → eval side (doc_id % EVAL_MOD == 0)
    rows += [(1, paraphrase), (3, unrelated)]
    _write_docs(spark, tmp_path, rows)

    fuzzy = decontaminate_fuzzy(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["eval_id"]) for r in fuzzy] == [(1, 0)]
    assert fuzzy[0]["jaccard"] >= FUZZY_THRESHOLD

    exact = decontaminate(spark, str(tmp_path)).collect()
    assert all(r["doc_id"] != 1 or r["n_hits"] == 0 for r in exact)


def test_fuzzy_on_fixture_is_deterministic_and_eval_free(spark):
    rows = decontaminate_fuzzy(spark, SF).collect()
    assert all(r["doc_id"] % EVAL_MOD != 0 for r in rows)
    assert all(r["eval_id"] % EVAL_MOD == 0 for r in rows)
    again = decontaminate_fuzzy(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_fuzzy_plan_broadcasts_eval_side(spark):
    plan = (
        decontaminate_fuzzy(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # band-key candidate join and the eval shingle-set join are broadcast;
    # the train side never sort-merges on the blocking key
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
