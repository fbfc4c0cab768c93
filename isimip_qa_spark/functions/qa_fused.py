"""Fused Python-side QA scoring: one Arrow round-trip instead of three.

langid + perplexity + scrub each need Python (model lookups, compiled-re
byte-identity); running them as separate pandas UDFs ships the `text` column
to the Python worker three times. This fused UDF computes all of them in one
batch pass — identical outputs to the individual backends by construction
(it calls the same series kernels).

The reference analogue is the shared-scan discipline: one open file feeds
all extractions (/root/reference/isimip_qa/main.py:130-136).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .scrub import _scrub_series

FUSED_SCHEMA = (
    "lang_pred string, avg_logprob double, ppl double, text_scrubbed string"
)


def _fused_series(texts: pd.Series) -> pd.DataFrame:
    """Single tokenize+explode shared by langid and perplexity; per-doc
    reductions via np.bincount (dyadic logprobs ⇒ the weighted bincount sum
    is exact, so outputs are bit-identical to the unfused kernels)."""
    import numpy as np

    from .langid import LANG_ORDER, _lookup
    from .perplexity import MODEL, OOV_LOGPROB

    texts = texts.reset_index(drop=True)
    n = len(texts)
    toks = texts.str.lower().str.split(" ").explode()
    idx = toks.index.to_numpy(dtype=np.int64)

    # perplexity: exact dyadic mean per doc
    lps = toks.map(MODEL).fillna(OOV_LOGPROB).to_numpy(dtype=np.float64)
    sums = np.bincount(idx, weights=lps, minlength=n)
    counts = np.bincount(idx, minlength=n)
    with np.errstate(invalid="ignore", divide="ignore"):
        avg = sums / counts
    avg[texts.isna().to_numpy()] = np.nan

    # langid: stop-word occurrence argmax (first max wins = LANG_ORDER)
    lang_ids = toks.map(_lookup())
    mask = lang_ids.notna().to_numpy()
    counts2d = np.zeros((n, len(LANG_ORDER)), dtype=np.int64)
    if mask.any():
        np.add.at(
            counts2d,
            (idx[mask], lang_ids.to_numpy()[mask].astype(np.int64)),
            1,
        )
    preds = np.array(LANG_ORDER, dtype=object)[counts2d.argmax(axis=1)]
    pred_s = pd.Series(preds, dtype="object")
    pred_s[texts.isna()] = None

    return pd.DataFrame(
        {
            "lang_pred": pred_s,
            "avg_logprob": avg,
            "ppl": np.exp(-avg),
            "text_scrubbed": _scrub_series(texts),
        }
    )


def qa_scores_udf(text: Column) -> Column:
    return F.pandas_udf(_fused_series, FUSED_SCHEMA)(text)
