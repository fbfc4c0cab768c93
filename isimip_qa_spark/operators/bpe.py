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
- The merge rewrite is a single `replace` on the symbol string, where
  EVERY symbol carries its own flanking spaces (' a  b  c ' — adjacent
  symbols are separated by TWO spaces). The pattern ' lhs  rhs ' →
  ' lhsrhs ' therefore consumes no neighbour's delimiter: with
  single-space separation, merging (a,a) in 'a a a a' eats the middle
  space and stalls at 'aa a a', diverging from canonical BPE; with each
  symbol self-delimited, replace-all's leftmost-non-overlapping scan
  yields 'aa aa' — exactly Sennrich's lookaround-regex merge order.
  Symbols never contain spaces, so the pattern can't match inside a
  multi-char symbol either.
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
    """' h  e  l  l  o ' — each char symbol wrapped in its own spaces
    (see module docstring for why double separation matters). `(?s)`
    makes `.` match newline chars inside words — whitespace tokenization
    splits only on ' ', so \\n/\\t are legitimate symbols."""
    return F.regexp_replace(w, "(?s)(.)", " $1 ")


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
        toks = F.split(F.trim(F.col("rep")), "  ")
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
                F.col("rep"), F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} ")
            ).alias("rep"),
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=False)
    return merges


def train_bpe_python(vocab: list[tuple[str, int]], n_merges: int):
    """Pure-Python golden reference with identical semantics (pair counts
    over all adjacent positions; replace-all leftmost-non-overlapping
    merge; (count desc, lhs, rhs) tie-break) — the test oracle."""
    reps = [(" " + "  ".join(w) + " ", c) for w, c in vocab]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for rep, c in reps:
            # split on the double separator, NOT .split(): symbols may BE
            # whitespace chars (\n, \t) that bare split() would swallow
            syms = rep[1:-1].split("  ")
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
            (rep.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} "), c)
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
    # NO empty-token filter and a LEFT broadcast join: split() always
    # yields >= 1 element per doc, so every doc keeps a row even when its
    # tokens are all empty (text '' / runs of spaces) — the empty tokens
    # miss the dim (word_vocab excludes them) and price to 0, exactly
    # matching bpe_segment's bpe_len_expr('') = 0. Row parity costs no
    # extra exchange this way.
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    return (
        toks.join(F.broadcast(dim), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("n_sub"), F.lit(0).cast("long"))).alias(
                "n_tok_bpe"
            )
        )
    )
