"""BPE tokenizer training as DataFrame algebra (north-star X3 — the
tokenizer-construction step of a training-data pipeline).

The classic byte-pair-encoding loop (Sennrich et al. 2016) is
corpus-scale only in its FIRST step: counting word frequencies. Every
merge iteration after that operates on the distinct-word table
weighted by frequency — vocabulary-sized, many orders of magnitude
smaller than the corpus. The Spark shape follows exactly:

1. ``word_frequencies``: one corpus scan + one (word) shuffle with
   map-side partial aggregation. This is the only 100 TB-sized stage.
2. ``learn_merges``: per round, (a) one vocabulary-sized aggregation
   to find the most frequent adjacent symbol pair (argmax is a 1-row
   ``TakeOrderedAndProject``, never a full sort), (b) one projection
   applying the merge to every word's symbol array — a left-to-right
   non-overlapping fold in pure Column algebra (``F.aggregate`` with a
   (array, skip) struct accumulator — no UDF, no Python), then an
   eager ``localCheckpoint`` to truncate the 2·n_merges-deep lineage
   (same discipline as ``operators/graph.connected_components``).

Pair counting uses OVERLAPPING adjacent positions ("aaa" counts
("a","a") twice) while a merge application is non-overlapping
left-to-right ("aaa" + merge (a,a) → ["aa","a"]) — the standard BPE
convention, pinned against a pure-Python reference implementation in
tests/test_bpe.py.

Determinism: ties in pair frequency break on the lexicographically
smallest pair; all counts are exact longs — the learned merge table is
engine-independent and reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the lowercased whitespace tokens — the one
    corpus-sized pass of BPE training."""
    return (
        docs.select(
            F.explode(tx.tokens_col(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def chars_col(word: Column) -> Column:
    """The word as an array of single characters (initial symbols)."""
    return F.transform(
        F.sequence(F.lit(1), F.char_length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol-pair counts over a
    (syms array<string>, freq long) table. Overlapping positions each
    count; the pair is emitted as "left right" (space-joined — symbols
    never contain whitespace, the tokenizer split it away)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.concat(
            F.element_at("syms", i),
            F.lit(" "),
            F.element_at("syms", (i + 1).cast("int")),
        ),
    )
    return (
        symbols.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("n_occurrences"))
    )


def apply_merge_col(syms: Column, left: str, right: str) -> Column:
    """Merge every non-overlapping left-to-right occurrence of the
    adjacent pair (left, right) in a symbol array: one ordered fold
    with a (merged-so-far, skip-next) struct accumulator. Column
    algebra only — runs inside codegen over the vocabulary table."""
    empty = F.array().cast("array<string>")

    def step(acc: Column, i: Column) -> Column:
        # 0-based F.get: NULL past the end (element_at THROWS under
        # ANSI, which Spark 4 enables by default)
        cur = F.get(syms, (i - 1).cast("int"))
        nxt = F.get(syms, i.cast("int"))  # NULL at the end
        here = (
            ~acc["skip"]
            & (cur == F.lit(left))
            & F.coalesce(nxt == F.lit(right), F.lit(False))
        )
        grown = F.when(
            acc["skip"], acc["arr"]
        ).otherwise(
            F.concat(
                acc["arr"],
                F.array(
                    F.when(here, F.concat(cur, nxt)).otherwise(cur)
                ),
            )
        )
        return F.struct(
            grown.alias("arr"),
            F.when(acc["skip"], F.lit(False)).otherwise(here).alias("skip"),
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.size(syms)),
        F.struct(empty.alias("arr"), F.lit(False).alias("skip")),
        step,
    )
    # arrays with no possible merge pass through untouched — REQUIRED
    # for the empty array (Spark's sequence(1, 0) counts DOWN, so the
    # fold would visit phantom indices), and a skipped fold for the
    # 1-symbol case
    return F.when(F.size(syms) < 2, syms).otherwise(folded["arr"])


def learn_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[int, str, int]]:
    """The BPE training loop: returns [(merge_rank, "left right",
    n_occurrences), ...] — driver-sized model state (like the
    persisted LM of streaming/lm_gate.py). Stops early if the
    vocabulary runs out of adjacent pairs."""
    vocab = (
        word_frequencies(docs, text_col)
        .select(chars_col(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, int]] = []
    for rank in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, n = best[0]["pair"], int(best[0]["n_occurrences"])
        merges.append((rank, pair, n))
        left, right = pair.split(" ")
        vocab = vocab.select(
            apply_merge_col(F.col("syms"), left, right).alias("syms"),
            "freq",
        ).localCheckpoint()
    return merges
