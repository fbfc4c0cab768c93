"""Scaling-efficiency evidence: the same QA job at two parallelism levels on
the same input — the sandbox proxy for N vs 4N executors (BASELINE.md
protocol; target efficiency ≥ 0.8).

Default levels: local[2] vs local[8]. Rationale (measured, see BASELINE.md):
the sandbox VM's 32 vCPUs clock down under full load (raw 32-process numpy
scales only ~2.3× over 8), so 8→32 measures frequency scaling, not the
engine; 2→8 stays inside the flat part of the frequency envelope (raw
multiprocessing efficiency 0.92) and is the honest N-vs-4N proxy. Both
matrices are reported.

Each level runs in its own subprocess (fresh JVM) so `local[N]` actually
differs; each level warms up before the measured run (bench.py reps).

Usage: python tools/bench_scaling.py [--update-baseline] [--full-matrix]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, pages_n: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_PAGES_N=str(pages_n),
        BENCH_QA_ONLY="1",
        BENCH_MODES=os.environ.get("BENCH_MODES", "single_pass"),
        BENCH_REPS=os.environ.get("BENCH_REPS", "3"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    pages_n = int(os.environ.get("BENCH_PAGES_N", "1000000"))
    levels = [2, 8, 32] if "--full-matrix" in sys.argv else [2, 8]
    res = {c: run_level(c, pages_n) for c in levels}
    lo, hi = res[levels[0]], res[levels[1]]
    eff = (hi["value"] / lo["value"]) / (levels[1] / levels[0])
    summary = {
        "pages_n": pages_n,
        "levels": {
            str(c): {
                "docs_per_sec": r["value"],
                "qa_single_pass_sec": r.get("qa_single_pass_sec"),
                "qa_chunked_sec": r.get("qa_pipeline_sec"),
            }
            for c, r in res.items()
        },
        "scaling_efficiency": round(eff, 3),
        "n_to_4n": f"local[{levels[0]}] -> local[{levels[1]}]",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary, indent=2))
    if "--update-baseline" in sys.argv:
        rows = "\n".join(
            f"| local[{c}] | {r['value']:.0f} | {r.get('qa_single_pass_sec')}s | "
            f"{r.get('qa_pipeline_sec')}s |"
            for c, r in res.items()
        )
        with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
            f.write(
                f"\n## Measured scaling (QA pipeline, {pages_n} docs, tmpfs)\n\n"
                f"| level | docs/sec (single_pass) | single_pass wall | chunked wall |\n"
                f"|---|---|---|---|\n{rows}\n\n"
                f"Scaling efficiency local[{levels[0]}]→local[{levels[1]}] "
                f"(N→4N): **{summary['scaling_efficiency']}** "
                f"({'PASS' if summary['pass'] else 'FAIL'}, target ≥ 0.8).\n"
            )


if __name__ == "__main__":
    main()
