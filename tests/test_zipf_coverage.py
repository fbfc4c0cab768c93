"""Zipf-slope fit and top-k vocabulary coverage: analytic answers on a
planted frequency spectrum (numpy least-squares as the independent fit
reference), tie-break determinism, and the TakeOrderedAndProject plan
contract (the vocabulary must never be globally sorted)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from isimip_qa_spark.queries.datasheet import (
    COVERAGE_KS,
    vocab_coverage,
    zipf_fit,
)

# 12 types with distinct counts 13..2 plus two TIED types ("tie_a"/"tie_b",
# count 7 each) exercising the (cnt DESC, w ASC) tie-break; k=10 falls
# inside the spectrum so coverage@10 is a real prefix sum
COUNTS = {f"w{i:02d}": 15 - i for i in range(1, 13)}  # w01:14 .. w12:3
COUNTS["tie_a"] = 7
COUNTS["tie_b"] = 7


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("zipf"))
    # one doc per type repetition keeps the fixture trivially re-derivable
    rows = [
        (i, " ".join([w] * c), "en", "src0", 1)
        for i, (w, c) in enumerate(sorted(COUNTS.items()))
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def _ranked_counts() -> list[int]:
    # (cnt DESC, w ASC) — the exact ordering both engines apply
    return [c for _, c in sorted(COUNTS.items(), key=lambda t: (-t[1], t[0]))]


def test_zipf_fit_matches_numpy_lstsq(spark, planted_dir):
    got = zipf_fit(spark, planted_dir).collect()[0]
    cnts = _ranked_counts()
    x = np.log(np.arange(1, len(cnts) + 1, dtype=float))
    y = np.log(np.array(cnts, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r2 = float(np.corrcoef(x, y)[0, 1] ** 2)
    assert got["n_fit"] == len(COUNTS)
    assert got["zipf_slope"] == pytest.approx(slope, abs=2e-6)
    assert got["zipf_intercept"] == pytest.approx(intercept, abs=2e-6)
    assert got["r2"] == pytest.approx(r2, abs=2e-6)


def test_coverage_analytic_prefix(spark, planted_dir):
    rows = {r["k"]: r for r in vocab_coverage(spark, planted_dir).collect()}
    cnts = _ranked_counts()
    total = sum(cnts)
    # only k=10 exists in a 14-type vocabulary (100 and 1000 exceed it)
    assert set(rows) == {k for k in COVERAGE_KS if k <= len(cnts)} == {10}
    top10 = sum(cnts[:10])
    assert rows[10]["cum_tokens"] == top10
    assert rows[10]["coverage"] == round(top10 / total, 6)


def test_tie_break_is_alphabetical(spark, planted_dir):
    """tie_a (rank before tie_b by name) must enter a prefix cut first:
    plant k=10 exactly between the two tied types' ranks."""
    cnts_sorted = sorted(COUNTS.items(), key=lambda t: (-t[1], t[0]))
    names = [w for w, _ in cnts_sorted]
    assert names.index("tie_a") + 1 < names.index("tie_b") + 1
    # ranks: tie_a at 8, tie_b at 9 → both inside k=10; the analytic
    # assertion above already pins the cumulative sum, this pins the order
    assert names[7] == "tie_a" and names[8] == "tie_b"


def test_head_extraction_is_take_ordered(spark, planted_dir):
    plan = (
        zipf_fit(spark, planted_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the top-V cut must be a distributed partial top-k merge, never a
    # global Sort of the vocabulary feeding a Limit
    assert "TakeOrderedAndProject" in plan


def test_fit_is_exact_on_a_true_power_law(spark, tmp_path):
    """counts = round(1000 · r^(-1)) for r=1..20 → slope ≈ −1, R² ≈ 1."""
    rows = [
        (r, " ".join([f"t{r:02d}"] * round(1000 / r)), "en", "s", 1)
        for r in range(1, 21)
    ]
    out = str(tmp_path / "pl")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = zipf_fit(spark, out).collect()[0]
    assert got["zipf_slope"] == pytest.approx(-1.0, abs=5e-3)
    assert got["r2"] > 0.9999
    assert math.isclose(got["zipf_intercept"], math.log(1000), abs_tol=5e-3)


def test_coverage_reuses_the_counts_exchange(spark, planted_dir):
    """The occurrence total is sum(cnt) over the SAME counts aggregate the
    head cut consumes — after execution, AQE must have deduplicated the
    corpus-scale exchange (one ReusedExchange), not scanned twice."""
    df = vocab_coverage(spark, planted_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
