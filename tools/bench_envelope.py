"""Machine-envelope probe matched to the QA workload's byte profile.

The round-1 envelope (0.86 at 2→8 cores) came from a cache-resident
pure-CPU probe — an upper bound for compute-only work. The QA kernel is not
cache-resident: per batch it encodes/joins/decodes multi-MB text buffers,
factorizes token streams, and allocates large intermediates — i.e. it is
partially memory-bandwidth-bound, and shared-socket bandwidth decays with
busy-core count on top of the frequency envelope.

This probe runs the ACTUAL fused kernel (functions/qa_fused._fused_series)
standalone — no Spark, no JVM, no shuffle, no IO — in N independent
processes confined to N cores, and reports per-worker batches/sec at each
level. The per-worker decay 2→8 is the honest machine bound for this byte
profile: no engine change can beat it, because there is no engine in the
loop. Levels are interleaved round-robin and each reports the max across
rounds (noise only subtracts).

Usage: python tools/bench_envelope.py [levels=2,8] [rounds=3] [secs=8]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

WORKER = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
# same malloc tuning the engine's Python workers get (session.py)
# (set by the parent before spawn; keep env as-is here)
from isimip_qa_spark.sources.pages import pages_pandas
from isimip_qa_spark.functions.qa_fused import _fused_series

batch = pages_pandas(np.arange(2000))["text"]
_fused_series(batch)  # warm model tables
t_end = time.time() + float(sys.argv[1])
n = 0
while time.time() < t_end:
    _fused_series(batch)
    n += 1
print(n)
"""


def run_level(n_workers: int, secs: float) -> float:
    """N kernel processes on N cores; returns total batches/sec."""
    procs = []
    for i in range(n_workers):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, "-c", WORKER, str(secs)],
                stdout=subprocess.PIPE,
                text=True,
                env=dict(
                    os.environ,
                    MALLOC_MMAP_THRESHOLD_="536870912",
                    MALLOC_TRIM_THRESHOLD_="536870912",
                ),
            )
        )
    total = 0
    for p in procs:
        out, _ = p.communicate()
        total += int(out.strip().splitlines()[-1])
    return total / secs


def main():
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,8").split(",")]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    best: dict[int, float] = {}
    for r in range(rounds):
        for lv in levels:
            rate = run_level(lv, secs)
            best[lv] = max(best.get(lv, 0.0), rate)
            print(
                f"round {r} level {lv}: {rate:.2f} batches/s "
                f"({rate / lv:.2f}/worker)",
                flush=True,
            )
    for a in levels:
        for b in levels:
            if b == 4 * a and a in best and b in best:
                eff = (best[b] / best[a]) / 4.0
                print(
                    f"ENVELOPE {a}->{b}: per-worker ratio {eff:.3f} "
                    f"(engine-free bound for the QA byte profile)"
                )


if __name__ == "__main__":
    main()
