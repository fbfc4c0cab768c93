"""DataFrame-native BPE tokenizer training (Sennrich et al. 2016 merge
loop) — the other half of the `bpe_merge_pairs` statistic (queries/
textmodel.py): that query computes ONE iteration's pair counts; this
operator runs the full merge loop and returns the ranked merge list a
tokenizer ships.

Physical design — why this scales where naive BPE doesn't:
- The corpus is touched ONCE: `word_vocab` reduces 10^12 documents to the
  distinct-word frequency table (Heaps' law: |vocab| grows ~ corpus^0.5,
  so ~10^7-10^8 rows where the corpus is 10^12 docs). Every merge
  iteration runs on the VOCAB, never the corpus.
- Each iteration is one bounded hash agg (explode adjacent symbol pairs
  weighted by word frequency → sum → top-1 by (count desc, pair asc)) —
  partial-aggregable, 2-symbol keys, the driver receives exactly one row.
- The merge rewrite is a single `replace` on the space-separated symbol
  string: ' lhs rhs ' → ' lhsrhs '. Symbols never contain spaces and the
  representation is space-padded, so plain substring replace cannot match
  inside a multi-char symbol, and replace-all's leftmost-non-overlapping
  scan IS BPE's merge order within a word.
- Lineage: n_merges chained replaces grow the plan linearly; the loop
  localCheckpoints the vocab frame every CHECKPOINT_EVERY iterations so
  the optimizer never sees an unbounded expression tree (the standard
  iterative-algorithm discipline, same as operators/components.py).

Applying a trained (or shipped) merge list to the corpus is pure column
exprs — see queries/textmodel.py `bpe_segment` (oracle-checked) — or, at
scale, a broadcast word→n_subwords dim joined map-side so each distinct
word pays the replace chain once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIR_SEP = "\x00"  # joins (lhs, rhs) into one agg key; never occurs in text
CHECKPOINT_EVERY = 8


def spaced_expr(w):
    """' h e l l o ' — space-padded char-level symbol string."""
    return F.concat(F.lit(" "), F.regexp_replace(w, "(.)", "$1 "))


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c): distinct whitespace words with corpus frequencies — the one
    corpus-wide pass; everything after runs on this."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_bpe(vocab: DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """Ranked merge list from a (w, c) vocab. Deterministic: ties on pair
    count break by the pair's symbol strings (lhs, then rhs), so retrains
    on the same corpus ship the identical tokenizer."""
    cur = vocab.select("c", spaced_expr(F.col("w")).alias("rep"))
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        toks = F.split(F.trim(F.col("rep")), " ")
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    PAIR_SEP,
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            cur.select(F.explode(pairs).alias("p"), "c")
            .groupBy("p")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), "p")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs = top[0].p.split(PAIR_SEP)
        merges.append((lhs, rhs))
        cur = cur.select(
            "c",
            F.replace(
                F.col("rep"), F.lit(f" {lhs} {rhs} "), F.lit(f" {lhs}{rhs} ")
            ).alias("rep"),
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=False)
    return merges


def train_bpe_python(vocab: list[tuple[str, int]], n_merges: int):
    """Pure-Python golden reference with identical semantics (pair counts
    over all adjacent positions; replace-all leftmost-non-overlapping
    merge; (count desc, lhs, rhs) tie-break) — the test oracle."""
    reps = [(" " + " ".join(w) + " ", c) for w, c in vocab]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for rep, c in reps:
            syms = rep.split()
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (lhs, rhs), _n = min(
            counts.items(),
            key=lambda kv: (-kv[1], kv[0][0] + PAIR_SEP + kv[0][1]),
        )
        merges.append((lhs, rhs))
        reps = [
            (rep.replace(f" {lhs} {rhs} ", f" {lhs}{rhs} "), c)
            for rep, c in reps
        ]
    return merges


def bpe_counts_via_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tok_bpe) computed through the word→n_subwords dim — the
    production path queries/textmodel.py's `bpe_segment` docstring names:
    each DISTINCT word pays the replace chain once (on the Heaps-law-
    sublinear vocab), then a broadcast map-side join prices every token
    occurrence; the corpus never shuffles text (only (doc_id, 8-ish-byte
    word-ref) rows reach the per-doc sum, and the sum is partial-
    aggregable). Bit-identical to the pure-expr path (tested)."""
    from ..queries.textmodel import bpe_len_expr

    dim = word_vocab(docs, text_col).select(
        "w", bpe_len_expr(F.col("w")).cast("long").alias("n_sub")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") > 0)
    return (
        toks.join(F.broadcast(dim), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_sub").alias("n_tok_bpe"))
    )
