"""Figure sink (S11 analogue): QA run → metrics rollup → rendered figure
artifact, driver-side only (the reference's plot phase,
/root/reference/isimip_qa/mixins/plots.py:17-28)."""

from __future__ import annotations

import os

from isimip_qa_spark.plans import QAConfig, run_qa
from isimip_qa_spark.plots import metrics_rollup, render_rollup


def test_render_rollup_figure(spark, pages_sdf, tmp_path):
    out = str(tmp_path / "qa")
    cfg = QAConfig(n_chunks=2, n_partitions=4, checkpoint_mode="single_pass")
    run_qa(spark, pages_sdf, cfg, out)

    roll = metrics_rollup(spark, out).collect()
    assert [r["chunk"] for r in roll] == [0, 1]
    assert all(0.0 < r["keep_rate"] < 1.0 for r in roll)

    fig = render_rollup(spark, out, str(tmp_path / "figs" / "rollup.svg"))
    assert os.path.exists(fig)
    with open(fig, "rb") as f:
        body = f.read()
    if body.lstrip().startswith(b"<svg"):
        text = body.decode()
        assert text.count('class="keep-bar"') == 2  # one bar per chunk
        assert "QA keep rate / perplexity per chunk" in text
        # data labels carry the actual rollup values
        for r in roll:
            assert f'data-chunk="{r["chunk"]}"' in text
    # matplotlib branch (not in this container) produces a binary/figure
    # file — existence + nonzero size is the contract there
    assert os.path.getsize(fig) > 500
