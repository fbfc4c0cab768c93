"""QA stages: each adds columns to the pages DataFrame (never filters — the
keep/drop decision is a column, so lineage can count rule trips).

The stage registry mirrors the reference's extraction plugin registry
(/root/reference/isimip_qa/extractions/__init__.py:11-22 walks the package
for Extraction subclasses) with explicit registration instead of import-time
magic; capability predicates (has_region/has_period, models.py:139-145)
become `Stage.applicable(cfg)`.

Everything is column expressions or Arrow pandas UDFs — no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textstats as ts
from ..functions.langid import lang_pred_udf
from ..functions.perplexity import ppl_udf
from ..functions.scrub import scrub_udf
from .config import QAConfig


@dataclass(frozen=True)
class Stage:
    name: str
    apply: Callable[[DataFrame, QAConfig], DataFrame]
    # columns this stage adds (lineage metadata + pruning discipline)
    adds: tuple[str, ...]


def _langid(df: DataFrame, cfg: QAConfig) -> DataFrame:
    return df.withColumn("lang_pred", lang_pred_udf(F.col("text")))


def _perplexity(df: DataFrame, cfg: QAConfig) -> DataFrame:
    s = ppl_udf(F.col("text"))
    return df.withColumns(
        {"avg_logprob": s["avg_logprob"], "ppl": s["ppl"]}
    )


def _rules(df: DataFrame, cfg: QAConfig) -> DataFrame:
    text = F.col("text")
    return df.withColumns(
        {
            "n_words": ts.n_words_expr(text),
            "mean_word_len": ts.mean_word_len_expr(text),
            "symbol_ratio": ts.symbol_ratio_expr(text),
            "distinct_word_ratio": ts.distinct_word_ratio_expr(text),
            "stopword_ratio": ts.stopword_ratio_expr(text, cfg.stopwords),
            "ellipsis_count": ts.ellipsis_count_expr(text),
        }
    )


def _scrub(df: DataFrame, cfg: QAConfig) -> DataFrame:
    # Python-re backend: the byte-identity invariant vs the pandas oracle
    return df.withColumn("text_scrubbed", scrub_udf(F.col("text")))


def rules_pass_expr(cfg: QAConfig) -> Column:
    return (
        (F.col("n_words") >= cfg.min_words)
        & (F.col("n_words") <= cfg.max_words)
        & (F.col("mean_word_len") >= cfg.min_mean_word_len)
        & (F.col("mean_word_len") <= cfg.max_mean_word_len)
        & (F.col("symbol_ratio") <= cfg.max_symbol_ratio)
        & (F.col("distinct_word_ratio") >= cfg.min_distinct_word_ratio)
        & (F.col("stopword_ratio") >= cfg.min_stopword_ratio)
        & (F.col("ellipsis_count") <= cfg.max_ellipsis)
    )


def _decision(df: DataFrame, cfg: QAConfig) -> DataFrame:
    keep = (
        rules_pass_expr(cfg)
        & (F.col("ppl") <= F.lit(cfg.max_ppl))
        & F.col("lang_pred").isin(*cfg.allowed_langs)
    )
    return df.withColumn("keep", keep)


def _python_scores_fused(df: DataFrame, cfg: QAConfig) -> DataFrame:
    """langid + perplexity + scrub in ONE Arrow round-trip (qa_fused.py);
    outputs are identical to the three individual stages (tested)."""
    from ..functions.qa_fused import qa_scores_udf

    s = qa_scores_udf(F.col("text"))
    return df.withColumns(
        {
            "lang_pred": s["lang_pred"],
            "avg_logprob": s["avg_logprob"],
            "ppl": s["ppl"],
            "text_scrubbed": s["text_scrubbed"],
        }
    ).withColumn("scrubbed", F.col("text_scrubbed") != F.col("text"))


STAGES: list[Stage] = [
    Stage("langid", _langid, ("lang_pred",)),
    Stage("perplexity", _perplexity, ("avg_logprob", "ppl")),
    Stage(
        "rules",
        _rules,
        (
            "n_words", "mean_word_len", "symbol_ratio",
            "distinct_word_ratio", "stopword_ratio", "ellipsis_count",
        ),
    ),
    Stage("scrub", _scrub, ("text_scrubbed",)),
    Stage("decision", _decision, ("keep",)),
]

# Physical plan actually executed by the pipeline: the three Python stages
# fused into one UDF; logical stage list (lineage) stays STAGES.
FUSED_STAGES: list[Stage] = [
    Stage(
        "python_scores",
        _python_scores_fused,
        ("lang_pred", "avg_logprob", "ppl", "text_scrubbed", "scrubbed"),
    ),
    STAGES[2],  # rules
    STAGES[4],  # decision
]
