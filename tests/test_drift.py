"""metrics_drift: a zero-change rerun reports exactly zero drift (the
exact-rollup contract — rates rebuilt from raw sums, never from rounded
partials); a stricter-threshold rerun shows a negative keep-rate delta on
every chunk and flags it; a chunk missing from one run is flagged."""

from __future__ import annotations

import pandas as pd

from isimip_qa_spark.plans import QAConfig, run_qa
from isimip_qa_spark.plans.drift import metrics_drift


def _run(spark, pages_sdf, cfg, out):
    run_qa(spark, pages_sdf, cfg, out)
    return f"{out}/metrics"


def test_drift_report(spark, pages_sdf, tmp_path):
    base = QAConfig(n_chunks=4, n_partitions=4)
    # pages word counts are 30 or >= 120 by design: 130 bites, 80 would not
    strict = QAConfig(n_chunks=4, n_partitions=4, min_words=130)

    m_a = _run(spark, pages_sdf, base, str(tmp_path / "a"))
    m_b = _run(spark, pages_sdf, base, str(tmp_path / "b"))
    m_c = _run(spark, pages_sdf, strict, str(tmp_path / "c"))

    # identical config: exact zeros everywhere, nothing flagged
    same = metrics_drift(spark, m_a, m_b).toPandas()
    assert len(same) == 4
    assert (same["keep_rate_delta"] == 0.0).all()
    assert (same["avg_ppl_delta"] == 0.0).all()
    assert (same["scrub_rate_delta"] == 0.0).all()
    assert (~same["flagged"]).all()

    # stricter min_words can only DROP the keep rate; it must drop
    # somewhere, and flagged must equal the tolerance predicate exactly
    drift = metrics_drift(spark, m_a, m_c).toPandas()
    assert (drift["keep_rate_delta"] <= 0).all()
    assert (drift["keep_rate_delta"] < 0).any()
    want_flag = (
        (drift["keep_rate_delta"].abs() > 0.01)
        | (drift["avg_ppl_delta"].abs() > 1.0)
        | (drift["scrub_rate_delta"].abs() > 0.01)
    )
    assert (drift["flagged"] == want_flag).all()
    assert drift["flagged"].any()
    # ppl is computed over the same docs (scoring unchanged): zero delta
    assert (drift["avg_ppl_delta"] == 0.0).all()

    # a chunk present in only one run is itself drift
    part = spark.read.parquet(m_a).filter("chunk != 3")
    m_d = str(tmp_path / "d_metrics")
    part.write.parquet(m_d)
    missing = metrics_drift(spark, m_d, m_a).toPandas().set_index("chunk")
    assert bool(missing.loc[3, "flagged"])
    assert pd.isna(missing.loc[3, "keep_rate_a"])
