"""Scaling-efficiency evidence: the same QA job at two parallelism levels
(local[8] vs local[32]) on the same input — the sandbox proxy for N vs 4N
executors (BASELINE.md protocol; target efficiency ≥ 0.8).

Each level runs in its own subprocess (fresh JVM) so `local[N]` actually
differs. Prints a JSON summary and, with --update-baseline, appends the
measured table to BASELINE.md.
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
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
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
    pages_n = int(os.environ.get("BENCH_PAGES_N", "200000"))
    lo = run_level(8, pages_n)
    hi = run_level(32, pages_n)
    eff = (hi["value"] / lo["value"]) / 4.0
    summary = {
        "pages_n": pages_n,
        "docs_per_sec_local8": lo["value"],
        "docs_per_sec_local32": hi["value"],
        "qa_sec_local8": lo["qa_pipeline_sec"],
        "qa_sec_local32": hi["qa_pipeline_sec"],
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary, indent=2))
    if "--update-baseline" in sys.argv:
        with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
            f.write(
                f"\n## Measured (round artifact)\n\n"
                f"| pages | docs/sec local[8] | docs/sec local[32] | efficiency |\n"
                f"|---|---|---|---|\n"
                f"| {pages_n} | {lo['value']} | {hi['value']} | "
                f"{summary['scaling_efficiency']} |\n"
            )


if __name__ == "__main__":
    main()
