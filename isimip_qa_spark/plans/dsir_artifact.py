"""DSIR model as a run artifact: fit once against an explicit target
corpus, persist as JSON, score any pages/documents DataFrame with the
broadcast model — the deployment shape of queries/dsir.py (whose
registered queries carve the target out of the corpus by doc_id so they
stay self-contained and oracle-able; a real pipeline's target is a
SEPARATE reference corpus, which is what this module takes).

Artifact discipline mirrors plans/checkpoint.py: the JSON carries a
fingerprint of the model constants (B, ALPHA, Q, hash constants) so a
loader refuses a model fitted under different feature hashing — the same
config-hash guard the chunk cache uses.

Scale shape: identical to the queries — the fit is one vectorized-kernel
pass collapsing to ≤ B rows per Arrow batch before the only (tiny)
shuffle; scoring is a zero-shuffle map with the 8 KB model in the UDF
closure.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.fingerprint import KNUTH, MOD31
from ..queries.dsir import (
    ALPHA,
    B,
    Q,
    _flagged_counts,
    _score_kernel,
    quantized_logratio,
)

# model identity: feature hashing + smoothing + quantization constants.
# A loader rejects an artifact whose fingerprint differs — scoring with a
# model fitted under other constants would be silently meaningless.
MODEL_FINGERPRINT = f"dsir:B={B}:alpha={ALPHA}:q={Q}:knuth={KNUTH}:mod={MOD31}"


def _flagged_count_batches(it):
    """mapInPandas kernel over (is_target, text): per-batch per-bucket
    target/raw n-gram counts via the shared `_flagged_counts` base
    (queries/dsir.py) with the explicit boolean column as the flag."""
    for pdf in it:
        yield _flagged_counts(pdf["is_target"].to_numpy(dtype=bool), pdf["text"])


def fit_dsir_artifact(
    raw: DataFrame, target: DataFrame, out_path: str
) -> dict:
    """Fit the B-bucket log-likelihood-ratio model from a raw-pool sample
    and a target-domain corpus (each any DataFrame with a `text` column)
    and write it to `out_path` as JSON. Returns the artifact dict.

    The union is ONE job: both sides flagged and concatenated, so the fit
    cost is one pass over raw+target regardless of how many buckets. The
    log-ratios are quantized to the dyadic 1/Q grid exactly like the
    oracle-checked query (per-doc score sums stay order-independent)."""
    flagged = raw.select(
        F.lit(False).alias("is_target"), F.col("text")
    ).unionByName(target.select(F.lit(True).alias("is_target"), F.col("text")))
    cnt = (
        flagged.mapInPandas(
            _flagged_count_batches, "bucket long, target_cnt long, raw_cnt long"
        )
        .groupBy("bucket")
        .agg(
            F.sum("target_cnt").alias("t"),
            F.sum("raw_cnt").alias("r"),
        )
        .collect()
    )
    t_cnt = [0] * B
    r_cnt = [0] * B
    for row in cnt:
        t_cnt[row["bucket"]] = row["t"]
        r_cnt[row["bucket"]] = row["r"]
    t_tot, r_tot = sum(t_cnt), sum(r_cnt)
    lr = [
        quantized_logratio(t_cnt[b], r_cnt[b], t_tot, r_tot) for b in range(B)
    ]
    artifact = {
        "fingerprint": MODEL_FINGERPRINT,
        "logratio": lr,
        "target_ngrams": t_tot,
        "raw_ngrams": r_tot,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(artifact, f)
    os.replace(tmp, out_path)  # atomic: a killed fit never leaves half a model
    return artifact


def load_dsir_artifact(path: str) -> dict:
    with open(path) as f:
        artifact = json.load(f)
    if artifact.get("fingerprint") != MODEL_FINGERPRINT:
        raise ValueError(
            f"DSIR artifact {path} was fitted under "
            f"{artifact.get('fingerprint')!r}, this build expects "
            f"{MODEL_FINGERPRINT!r} — refusing to score with it"
        )
    if len(artifact["logratio"]) != B:
        raise ValueError(f"DSIR artifact {path}: expected {B} buckets")
    return artifact


def dsir_logweight_col(artifact: dict, text: Column) -> Column:
    """`logweight` column from the broadcast model — zero shuffle."""
    import numpy as np

    lr = np.asarray(artifact["logratio"], dtype=np.float64)
    udf = F.pandas_udf(_score_kernel(lr), "n_grams long, logweight double")
    return udf(text).getField("logweight")


def score_with_artifact(df: DataFrame, artifact: dict) -> DataFrame:
    """`df` + `dsir_logweight` column (any DataFrame with `text`)."""
    return df.withColumn(
        "dsir_logweight", dsir_logweight_col(artifact, F.col("text"))
    )
