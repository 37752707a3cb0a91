"""Distributed BPE tokenizer training — iterative merge learning.

The missing half of the engine's tokenizer story: bpe_pair_counts
(queries.py) computes step-one pair statistics; this module runs the
full training loop (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") and can re-encode text with the
learned merges.

Scale shape — the classic trick that makes BPE trainable on a 10^10-
document corpus: train over the WORD-TYPE table, not the token stream.
One corpus pass builds (word, freq); every iteration after that runs
over the vocabulary (heavy-tailed, bounded — millions of rows, not
10^10):

* pair counting = explode adjacent symbol pairs weighted by word freq,
  map-side-combined groupBy (vocabulary-bounded state);
* argmax = orderBy + take(1) — a ONE-row collect per iteration with a
  deterministic tiebreak (count desc, left asc, right asc), the same
  bounded-collect pattern as the IVF centroid loop;
* merge application = a pure-JVM left-to-right greedy fold over each
  word's symbol array, applied only to words that contain the pair.

Iterations nest expression trees; ``checkpoint_every`` truncates the
lineage with localCheckpoint the way the pagerank operator does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text", sep: str = "[^a-z]+") -> DataFrame:
    """(word, freq) over the lower-cased corpus — the one corpus-wide
    pass; everything after runs on this vocabulary-sized table."""
    return (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), sep)).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def merge_pair_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of one merge
    (left, right) -> left||right over a symbol array, as a pure-JVM
    fold. F.get (0-based, NULL out of range) keeps the empty-prefix
    probe safe under ANSI mode."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    checkpoint_every: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Returns [(left, right, corpus_pair_count), ...] in merge order.
    Deterministic: ties break on (left, right) ascending.
    """
    vocab = words.select(
        F.split(F.col(word_col), "").alias("s"), F.col(freq_col).alias("f")
    )
    merges: list[tuple[str, str, int]] = []
    for step in range(n_merges):
        pairs = (
            vocab.where(F.size("s") >= 2)
            .select(
                "f",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("s"), 1, F.size("s") - 1),
                        F.slice(F.col("s"), 2, F.size("s") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("f").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), F.col("l"), F.col("r")).take(1)
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((l, r, n))
        has_pair = F.exists(
            F.zip_with(
                F.slice(F.col("s"), 1, F.size("s") - 1),
                F.slice(F.col("s"), 2, F.size("s") - 1),
                lambda a, b: (a == F.lit(l)) & (b == F.lit(r)),
            ),
            lambda x: x,
        )
        vocab = vocab.select(
            F.when(has_pair, merge_pair_fold(F.col("s"), l, r))
            .otherwise(F.col("s"))
            .alias("s"),
            "f",
        )
        if checkpoint_every and (step + 1) % checkpoint_every == 0:
            # r6 (guide §3.3 "materialising an intermediate truncates
            # the plan"): EAGER checkpoint every iteration. Each merge
            # application embeds the previous vocab expression several
            # times (has_pair + the fold both reference `s`, and
            # CollapseProject inlines single-consumer projections), so
            # a lazy tail grows the expression tree ~5x PER ITERATION —
            # measured 285 s of pure driver-side planning for 6 merges
            # over a FIVE-row vocabulary with the old
            # checkpoint_every=8/eager=False. An eager per-iteration
            # checkpoint is one vocabulary-sized job (bounded by
            # design) and keeps planning O(1) per step: 285 s -> ~3 s.
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_encode(word: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Symbol array for a word under the learned merges (applied in
    merge order — nested JVM folds, no Python)."""
    syms = F.split(word, "")
    for l, r, _ in merges:
        syms = merge_pair_fold(syms, l, r)
    return syms
