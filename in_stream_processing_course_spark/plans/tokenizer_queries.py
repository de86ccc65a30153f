"""Tokenizer-training queries over ``documents`` (operators/bpe):
the corpus-sized pair-count pass is oracle-backed; the iterative
merge-learning loop is rows-only (a fixed-point driver loop is not one
DuckDB statement) and pinned against a pure-Python BPE reference in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import chars_col, learn_merges, pair_counts, word_frequencies
from ..sources.batch import load_table

_TOP_PAIRS = 100
_N_MERGES = 20


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 0 of BPE training: the top adjacent character pairs by
    frequency-weighted occurrence count across the corpus vocabulary.

    Plan: one corpus scan → (word) shuffle with map-side partial
    aggregation (the vocabulary reduction — the only 100 TB-sized
    stage of tokenizer training) → a vocabulary-sized pair explode +
    (pair) aggregate → 100-row TakeOrderedAndProject. Overlapping
    positions each count ("aaa" contributes ("a","a") twice) — the
    standard BPE convention, and what the oracle reproduces."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = word_frequencies(docs).select(
        chars_col(F.col("word")).alias("syms"), "freq"
    )
    return (
        pair_counts(vocab)
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(_TOP_PAIRS)
    )


ORACLE_BPE_PAIR_COUNTS = rf"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> len(x) > 0)) AS word
  FROM documents
),
vocab AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
pairs AS (
  SELECT substring(word, i, 1) || ' ' || substring(word, i + 1, 1) AS pair,
         freq
  FROM vocab, unnest(generate_series(1, len(word) - 1)) AS t(i)
  WHERE len(word) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC LIMIT {_TOP_PAIRS}
"""


def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: _N_MERGES merge rounds over the
    corpus vocabulary (operators/bpe.learn_merges — one
    vocabulary-sized argmax + one merge projection per round, lineage
    truncated per round; only the merge table itself, one row per
    round, ever reaches the driver). Rows-only driver check; the
    loop's arithmetic is pinned against a pure-Python BPE reference in
    tests/test_bpe.py, and the merge table is deterministic by
    construction (exact long counts, lexicographic tie-break)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_merges(docs, _N_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, n_occurrences long"
    ).orderBy("merge_rank")
