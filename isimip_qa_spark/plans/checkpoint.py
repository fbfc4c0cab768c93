"""Checkpoint/restart at stage boundaries (reference analogue: skip an
extraction whose artifact exists or is fetchable —
/root/reference/isimip_qa/main.py:126-128, mixins/extractions.py:16-28).

Unit of resume: a *chunk* — a deterministic bucket range of the corpus
(bucket = pmod(xxhash64(url), n_chunks)). Each chunk is one fused Spark job
whose output lands in `out_dir/data/chunk=K/`; a chunk's manifest file is
written only after its job commits, so a killed run resumes by re-running
exactly the missing chunks. On an Iceberg deployment the manifest is the
snapshot log and a chunk is a partition-scoped append — same structure,
different sink.
"""

from __future__ import annotations

import json
import os


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def chunk_path(out_dir: str, chunk: int) -> str:
    return os.path.join(out_dir, "data", f"chunk={chunk}")


def completed_chunks(out_dir: str) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("chunk_") and name.endswith(".json"):
            done.add(int(name[len("chunk_") : -len(".json")]))
    return done


def mark_chunk_done(out_dir: str, chunk: int, info: dict) -> None:
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".chunk_{chunk}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(info, f, sort_keys=True)
    os.replace(tmp, os.path.join(mdir, f"chunk_{chunk}.json"))  # atomic


def read_manifest(out_dir: str) -> dict[int, dict]:
    out = {}
    for c in sorted(completed_chunks(out_dir)):
        with open(os.path.join(manifest_dir(out_dir), f"chunk_{c}.json")) as f:
            out[c] = json.load(f)
    return out
