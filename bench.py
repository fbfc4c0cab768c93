"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric: QA-pipeline docs/sec over a deterministic synthetic pages
corpus (the BASELINE.json workload), plus per-query seconds for the
reference-operator twins at $SPARK_GRAFT_SF_DIR.

Env knobs:
    SPARK_GRAFT_SF_DIR   table dir     (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[N]      (default 32)
    BENCH_PAGES_N        pages corpus  (default 100_000)
    BENCH_SKIP_PAGES=1   skip the QA-pipeline segment

Scaling evidence (local[8] vs local[32]) is produced by
tools/bench_scaling.py, which invokes this script in two subprocesses.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_N = int(os.environ.get("BENCH_PAGES_N", "100000"))

# headline operator queries (a spread over agg / window / join / UDF / dedup
# / ANN; the slow expr-minhash variant is exercised at sf0.01 by the
# correctness gate, not here)
BENCH_QUERIES = [
    "pricing_summary",
    "weighted_mean",
    "countmap",
    "histogram",
    "histogram_cdf",
    "calendar_stats",
    "climatology_doy_znorm",
    "mask_semi_join",
    "gopher_rules",
    "langid",
    "perplexity",
    "scrub_pii",
    "quality_score",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "embed_norm_stats",
]


def _pages_path(n: int) -> str:
    return os.path.join(tempfile.gettempdir(), f"bench_pages_{n}")


def ensure_pages(spark, n: int) -> str:
    """Generate-once pages parquet (marker-gated, deterministic content)."""
    path = _pages_path(n)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from isimip_qa_spark.sources.pages import write_pages

        write_pages(spark, path, n, num_partitions=max(CPUS, 8))
    return path


def main() -> None:
    from isimip_qa_spark.session import get_spark

    import __spark_entry__ as ent

    spark = get_spark(
        app_name=f"bench-local{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = ent.queries()
    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()  # force full execution
        per_query[name] = round(time.time() - t0, 3)
        assert n >= 0

    result = {
        "metric": "qa_docs_per_sec",
        "unit": "sec",
        "sf": SF_DIR,
        "cpus": CPUS,
        "queries": per_query,
        "queries_total_sec": round(sum(per_query.values()), 3),
    }

    if os.environ.get("BENCH_SKIP_PAGES") != "1":
        from isimip_qa_spark.plans import QAConfig, run_qa

        pages_path = ensure_pages(spark, PAGES_N)
        pages = spark.read.parquet(pages_path)
        out_dir = tempfile.mkdtemp(prefix="bench_qa_")
        cfg = QAConfig(n_chunks=4, n_partitions=CPUS * 2)
        t0 = time.time()
        summary = run_qa(spark, pages, cfg, out_dir, resume=False)
        qa_wall = time.time() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        result["qa_pipeline_sec"] = round(qa_wall, 3)
        result["qa_docs"] = summary["rows"]
        result["value"] = round(summary["rows"] / qa_wall, 2)
    else:
        result["value"] = round(sum(per_query.values()), 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
