"""Multi-scope orchestration: the reference's quadruple planning loop
(dataset × region × period × extraction, /root/reference/isimip_qa/main.py:115-128,
with the placeholder cartesian product /root/reference/isimip_qa/config.py:38-65),
recast as a (window × cohort) grid of QA runs.

Each combo is one `run_qa` invocation with its own output directory keyed by
the combo's config hash — the per-combo artifact-cache skip
(main.py:126-128) falls out of run_qa's chunk manifest: a completed combo
resumes in milliseconds without a scan, a half-finished combo re-runs only
its missing chunks, and a combo never started runs fully. A grid killed
mid-way therefore resumes with exactly the incomplete combos
(tests/test_grid.py kills after the first combo and asserts this).

Capability pruning (the reference's has_region/has_period predicates,
models.py:139-145): a cohort whose languages are all outside
cfg.allowed_langs can keep nothing — the combo is planned but marked
inapplicable and skipped before any job is submitted.

Shared statistics: hot hosts are detected ONCE over the unscoped corpus and
passed to every combo (the reference's process-wide mask cache analogue,
config.py:18-19) — scoped subsets of a crawl share the same host skew, and
re-detecting per combo would re-scan the table per grid cell.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from .checkpoint import completed_chunks
from .config import QAConfig
from .pipeline import run_qa
from .skew import detect_hot_hosts

Window = tuple[str, str] | None
Cohort = tuple[str, ...] | None


def combo_label(window: Window, cohort: Cohort) -> str:
    """Deterministic human-readable directory stem for one grid cell (the
    reference's artifact-path templating, models.py:29-37: scope values
    formatted into the artifact name, `_global_` for the no-op scope)."""
    w = "all" if window is None else f"{window[0][:10]}_{window[1][:10]}"
    c = "global" if cohort is None else "-".join(cohort)
    return f"window={w}/cohort={c}"


def plan_grid(
    base_cfg: QAConfig,
    windows: list[Window],
    cohorts: list[Cohort],
) -> list[tuple[str, QAConfig, bool]]:
    """Cartesian product of scopes → (label, config, applicable) combos.

    `applicable` is False when the cohort cannot intersect allowed_langs —
    the capability-predicate prune; such combos are reported, never run."""
    out = []
    for w in windows:
        for c in cohorts:
            cfg = dataclasses.replace(base_cfg, window=w, cohort_langs=c)
            applicable = c is None or bool(set(c) & set(cfg.allowed_langs))
            out.append((combo_label(w, c), cfg, applicable))
    return out


def combo_dir(out_root: str, label: str, cfg: QAConfig) -> str:
    # hash suffix: two combos with the same scopes but different thresholds
    # never share artifacts (the reference keys artifacts by extraction
    # identity, mixins/extractions.py:33-40)
    return os.path.join(out_root, label, cfg.config_hash())


def run_grid(
    spark: SparkSession,
    pages: DataFrame,
    base_cfg: QAConfig,
    windows: list[Window],
    cohorts: list[Cohort],
    out_root: str,
    resume: bool = True,
    hot_hosts: list[str] | None = None,
    cache_base: str | None = None,
) -> dict:
    """Run every applicable (window × cohort) combo, resuming completed or
    partial combos from their manifests. An exception mid-grid propagates
    (driver-restart semantics); completed combos keep their manifests and
    are skipped on the next invocation.

    `cache_base`: root of another grid's output — each combo looks for its
    own label/config-hash subtree there and fetches completed chunks
    instead of recomputing (checkpoint.fetch_chunk)."""
    t0 = time.time()
    combos = plan_grid(base_cfg, windows, cohorts)

    results: dict[str, dict] = {}
    for label, cfg, applicable in combos:
        if not applicable:
            results[label] = {"status": "inapplicable"}
            continue
        cdir = combo_dir(out_root, label, cfg)
        already = len(completed_chunks(cdir)) if resume else 0
        if hot_hosts is None and already < cfg.n_chunks:
            # one corpus-level scan for skew stats, shared by all combos —
            # detected LAZILY on the first combo that actually has work, so
            # re-invoking a fully-completed grid stays a no-op (the
            # exists()-skip semantics, reference main.py:126-128)
            hot_hosts = detect_hot_hosts(pages, base_cfg.hot_host_frac)
        combo_cache = (
            f"{cache_base.rstrip('/')}/{label}/{cfg.config_hash()}"
            if cache_base
            else None
        )
        summary = run_qa(
            spark,
            pages,
            cfg,
            cdir,
            resume=resume,
            hot_hosts=hot_hosts,
            cache_base=combo_cache,
        )
        summary["status"] = (
            "resumed" if already == cfg.n_chunks else
            "fetched" if summary.get("chunks_fetched") and not summary["chunks_run"]
            else "partial_resume" if already else "ran"
        )
        results[label] = summary
        _write_grid_manifest(out_root, results)

    out = {
        "combos": results,
        "n_ran": sum(r.get("status") == "ran" for r in results.values()),
        "n_resumed": sum(
            r.get("status") in ("resumed", "partial_resume")
            for r in results.values()
        ),
        "n_inapplicable": sum(
            r.get("status") == "inapplicable" for r in results.values()
        ),
        "n_fetched": sum(r.get("status") == "fetched" for r in results.values()),
        "hot_hosts": hot_hosts or [],
        "wall_s": round(time.time() - t0, 3),
    }
    _write_grid_manifest(out_root, results)
    return out


def _write_grid_manifest(out_root: str, results: dict) -> None:
    os.makedirs(out_root, exist_ok=True)
    tmp = os.path.join(out_root, ".grid_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {k: v.get("status") for k, v in results.items()}, f, sort_keys=True
        )
    os.replace(tmp, os.path.join(out_root, "grid_manifest.json"))
