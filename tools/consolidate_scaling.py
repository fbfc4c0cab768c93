"""Consolidate the round-3 scaling campaign into repo-root SCALING.json.

Inputs (produced by tools/scaling_campaign.sh + the final confirmation
run) live under /tmp/scaling_r3/. bench.py attaches SCALING.json verbatim
under its "scaling" key, so the per-round BENCH record carries the
two-cluster-size evidence without re-paying the multi-JVM campaign.

Usage: python tools/consolidate_scaling.py [campaign_dir] [final_name]
"""

from __future__ import annotations

import json
import os
import re
import sys

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_r3"
FINAL = sys.argv[2] if len(sys.argv) > 2 else "final2.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    with open(os.path.join(DIR, name)) as f:
        return json.load(f)


def main() -> None:
    final = _load(FINAL)
    baseline = _load("baseline.json")
    zstd3 = _load("zstd3.json")
    arrow = _load("arrow2048.json")

    envelope = None
    with open(os.path.join(DIR, "envelope.json")) as f:
        m = re.search(r"per-worker ratio ([0-9.]+)", f.read())
        if m:
            envelope = float(m.group(1))

    pair14 = final["n_to_4n_pairs"].get("local[1] -> local[4]", {})
    out = {
        "protocol": (
            "QA single_pass over a deterministic 4M-doc pages corpus on "
            "tmpfs; one fresh JVM per level, taskset-confined to exactly N "
            "cores, levels interleaved in time, min of 3 rounds per level; "
            "machine otherwise idle (the kernel is partially memory-"
            "bandwidth-bound, so concurrent work on OTHER cores depresses "
            "high-core levels)"
        ),
        "pages_n": final["pages_n"],
        "rounds": final["rounds"],
        "levels": final["levels"],
        "n_to_4n_pairs": final["n_to_4n_pairs"],
        "headline": {
            "criterion": "throughput scaling efficiency >= 0.8 from N to 4N",
            "pair": "local[1] -> local[4]",
            "efficiency": pair14.get("scaling_efficiency"),
            "pass": pair14.get("pass"),
        },
        "sink_codec_sweep_2_8": {
            "what": (
                "2->8 walls vs metrics-sink parquet codec; zstd level 3 is "
                "strictly FASTER at both core counts (the reason it is the "
                "committed default, plans/sink.py); its efficiency RATIO is "
                "lower than zstd1's same-campaign 0.881 because it helps "
                "the 2-core level more"
            ),
            "zstd_level_1_default_before": baseline["n_to_4n_pairs"][
                "local[2] -> local[8]"
            ]["scaling_efficiency"],
            "zstd_level_3": zstd3["n_to_4n_pairs"]["local[2] -> local[8]"][
                "scaling_efficiency"
            ],
            "arrow_batch_2048_control": arrow["n_to_4n_pairs"][
                "local[2] -> local[8]"
            ]["scaling_efficiency"],
            "levels_zstd3": zstd3["levels"],
        },
        "repeatability_2_8": {
            "note": (
                "clean round-3 runs of the 2->8 pair (zstd1 baseline "
                "matrix; zstd3 sweep run; zstd3 confirmation matrix — the "
                "last two the SAME configuration) span 0.795-0.881: the "
                "VM's repeat variance brackets the 0.8 target"
            ),
            "runs": [
                baseline["n_to_4n_pairs"]["local[2] -> local[8]"][
                    "scaling_efficiency"
                ],
                zstd3["n_to_4n_pairs"]["local[2] -> local[8]"][
                    "scaling_efficiency"
                ],
                final["n_to_4n_pairs"]
                .get("local[2] -> local[8]", {})
                .get("scaling_efficiency"),
            ],
        },
        "machine_envelope_2_8_per_worker": envelope,
        "envelope_note": (
            "tools/bench_envelope.py: the actual fused kernel in N "
            "single-core-pinned processes, no Spark/JVM — the engine-free "
            "bound for this byte profile on this box"
        ),
    }
    path = os.path.join(REPO, "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    print(json.dumps(out["headline"]))


if __name__ == "__main__":
    main()
