"""Figure sink — the reference's plot phase, Sparkified (S11 analogue).

The reference's plots re-read extraction artifacts, aggregate in pandas,
and render a grid of matplotlib panels to SVG/PNG
(/root/reference/isimip_qa/mixins/plots.py:17-28,116-158,
/root/reference/isimip_qa/plots/*.py). The engine-side math of every plot
(A10-A15) already lives in oracle-checked queries; this module closes the
*presentation* entry point: collect a small driver-side rollup from the QA
metrics table (the artifact analogue) and render one figure.

Rendering backends: matplotlib when importable (savefig, like the
reference's Figure sink, mixins/plots.py:17-28); otherwise a dependency-free
deterministic SVG writer — same data, same artifact contract, testable in
environments without plotting libs. Only the rollup (one row per chunk)
ever reaches the driver; the corpus does not."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def metrics_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-chunk rollup over the metrics table (reference analogue: a plot
    re-reading its extraction CSV, plots/daily.py:15-17). Small by
    construction: one row per chunk."""
    m = spark.read.parquet(f"{out_dir}/metrics")
    return (
        m.groupBy("chunk")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            (F.sum("n_keep") / F.sum("n_docs")).alias("keep_rate"),
            # docs-weighted mean of the per-partition avg_ppl rounds —
            # presentation-grade (the exact per-doc mean would need raw sums)
            (F.sum(F.col("avg_ppl") * F.col("n_docs")) / F.sum("n_docs")).alias(
                "avg_ppl"
            ),
            F.sum("n_scrubbed").alias("n_scrubbed"),
        )
        .orderBy("chunk")
    )


def render_rollup(spark: SparkSession, out_dir: str, fig_path: str) -> str:
    """Collect the rollup and render keep-rate per chunk (bars) with the
    average perplexity (markers). Returns the written path."""
    rows = metrics_rollup(spark, out_dir).collect()
    chunks = [r["chunk"] for r in rows]
    keep = [float(r["keep_rate"] or 0.0) for r in rows]
    ppl = [float(r["avg_ppl"] or 0.0) for r in rows]
    os.makedirs(os.path.dirname(fig_path) or ".", exist_ok=True)
    try:
        import matplotlib  # noqa: F401

        return _render_matplotlib(fig_path, chunks, keep, ppl)
    except ImportError:
        return _render_svg(fig_path, chunks, keep, ppl)


def _render_matplotlib(fig_path, chunks, keep, ppl) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots(figsize=(8, 4.5))
    ax1.bar([str(c) for c in chunks], keep)
    ax1.set_ylabel("keep rate")
    ax1.set_xlabel("chunk")
    ax1.set_ylim(0, 1)
    ax2 = ax1.twinx()
    ax2.plot([str(c) for c in chunks], ppl, marker="o")
    ax2.set_ylabel("avg perplexity")
    fig.suptitle("QA keep rate / perplexity per chunk")
    fig.savefig(fig_path)
    plt.close(fig)
    return fig_path


# --- dependency-free SVG backend -------------------------------------------

_W, _H, _PAD = 640, 360, 48


def _render_svg(fig_path, chunks, keep, ppl) -> str:
    n = max(len(chunks), 1)
    plot_w, plot_h = _W - 2 * _PAD, _H - 2 * _PAD
    bw = plot_w / n * 0.7
    ppl_max = max(ppl + [1.0])
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}">',
        f'<title>QA keep rate / perplexity per chunk</title>',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        # axes
        f'<line x1="{_PAD}" y1="{_H - _PAD}" x2="{_W - _PAD}" y2="{_H - _PAD}" '
        f'stroke="black"/>',
        f'<line x1="{_PAD}" y1="{_PAD}" x2="{_PAD}" y2="{_H - _PAD}" '
        f'stroke="black"/>',
    ]
    pts = []
    for i, (c, k, p) in enumerate(zip(chunks, keep, ppl)):
        x0 = _PAD + plot_w * (i + 0.15) / n
        bh = plot_h * min(max(k, 0.0), 1.0)
        parts.append(
            f'<rect class="keep-bar" data-chunk="{c}" data-keep="{k:.4f}" '
            f'x="{x0:.1f}" y="{_H - _PAD - bh:.1f}" width="{bw:.1f}" '
            f'height="{bh:.1f}" fill="#4878a8"/>'
        )
        parts.append(
            f'<text x="{x0 + bw / 2:.1f}" y="{_H - _PAD + 16}" '
            f'font-size="11" text-anchor="middle">{c}</text>'
        )
        pts.append(
            (x0 + bw / 2, _H - _PAD - plot_h * (p / ppl_max if ppl_max else 0))
        )
    if len(pts) > 1:
        path = " ".join(f"{x:.1f},{y:.1f}" for x, y in pts)
        parts.append(
            f'<polyline class="ppl-line" points="{path}" fill="none" '
            f'stroke="#c0504d" stroke-width="2"/>'
        )
    for (x, y), p in zip(pts, ppl):
        parts.append(
            f'<circle class="ppl-pt" data-ppl="{p:.2f}" cx="{x:.1f}" '
            f'cy="{y:.1f}" r="3" fill="#c0504d"/>'
        )
    parts.append(
        f'<text x="{_W / 2}" y="24" font-size="14" text-anchor="middle">'
        f"QA keep rate / perplexity per chunk</text>"
    )
    parts.append("</svg>")
    with open(fig_path, "w") as f:
        f.write("\n".join(parts))
    return fig_path
