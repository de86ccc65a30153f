"""BPE tokenizer training AND encoding as DataFrame algebra
(north-star X3 — the tokenizer-construction step of a training-data
pipeline, plus the encode pass that consumes the trained artifact).

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


def corpus_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, syms, freq), eagerly checkpointed — THE corpus-sized
    pass of BPE (one scan + one word shuffle). Training, encoding and
    the fertility map all start from this table; building it once and
    passing it to each lets a train-then-encode pipeline scan the
    corpus exactly once."""
    return (
        word_frequencies(docs, text_col)
        .select("word", chars_col(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )


def encode_vocab(
    vocab: DataFrame, merges: list[str], chunk: int = 3
) -> DataFrame:
    """ENCODE: apply a learned merge table to a (syms array<string>,
    freq long) vocabulary table, in merge-rank order — the consumer of
    :func:`learn_merges` (training produces the artifact, this is what
    a data pipeline actually runs with it). ``merges`` is the ranked
    list of "left right" pairs.

    :func:`apply_merge_col` projections run over the VOCABULARY table
    (never the corpus), with an eager ``localCheckpoint`` every
    ``chunk`` merges: fully chaining the fold expressions would let
    ProjectCollapse inline each round's ~6 references to the previous
    round's output — an expression tree EXPONENTIAL in the merge count
    — while checkpointing every round (as the training loop must, to
    see each round's argmax) pays one driver-paced job barrier per
    merge. chunk=3 keeps the inlined tree ~6³ nodes and cuts the
    barrier count 3x; unlike training, encoding has no per-round
    driver decision, so batching is free. Encoding a corpus is
    therefore ceil(n_merges/chunk) vocabulary-sized rounds after the
    single corpus-sized word-count scan. ``chunk`` is clamped to
    [1, 4]: at 5+ the inlined tree (~6^chunk nodes per row) tips from
    thousands into the 100k+ range and analysis itself OOMs the
    driver (measured: chunk=8 kills a 6g JVM)."""
    chunk = min(max(chunk, 1), 4)
    out = vocab
    carried = [c for c in vocab.columns if c != "syms"]
    for i in range(0, len(merges), max(chunk, 1)):
        col = F.col("syms")
        for pair in merges[i : i + max(chunk, 1)]:
            left, right = pair.split(" ")
            col = apply_merge_col(col, left, right)
        out = out.select(col.alias("syms"), *carried).localCheckpoint()
    return out


def encode_token_counts(
    docs: DataFrame,
    merges: list[str],
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(token, n_tokens) over the corpus encoded with a learned merge
    table: ONE corpus scan (the word-frequency aggregation — shared
    with training when the caller passes the :func:`corpus_vocab` it
    trained from), then vocabulary-sized encode rounds, then explode
    the per-word token arrays weighted by word frequency. The output
    is the corpus token histogram — the artifact a tokenizer-aware
    mixing/packing stage consumes."""
    if vocab is None:
        vocab = corpus_vocab(docs, text_col)
    return (
        encode_vocab(vocab.select("syms", "freq"), merges)
        .select(F.explode("syms").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("n_tokens"))
    )


def word_fertility(
    docs: DataFrame,
    merges: list[str],
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(word, n_toks): the tokenizer FERTILITY map — per distinct
    word, how many tokens the learned merge table encodes it into.
    Vocabulary-sized (the broadcastable side of any per-document
    fertility metric); carries the original word string through the
    encode rounds so downstream joins key on it. Pass the
    :func:`corpus_vocab` training used to avoid a second corpus
    scan."""
    if vocab is None:
        vocab = corpus_vocab(docs, text_col)
    return encode_vocab(vocab.select("word", "syms"), merges).select(
        "word", F.size("syms").cast("long").alias("n_toks")
    )


def learn_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> list[tuple[int, str, int]]:
    """The BPE training loop: returns [(merge_rank, "left right",
    n_occurrences), ...] — driver-sized model state (like the
    persisted LM of streaming/lm_gate.py). Stops early if the
    vocabulary runs out of adjacent pairs. Pass a prebuilt
    :func:`corpus_vocab` to share its single corpus scan with the
    encode that follows."""
    if vocab is None:
        vocab = corpus_vocab(docs, text_col)
    vocab = vocab.select("syms", "freq")
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


# chained apply_merge_col projections inline to a ~6^n expression tree
# (see encode_vocab) — the per-checkpoint batch cap, NOT the merge
# batch cap (a batch of 8 safe merges runs as two chained projections)
_APPLY_CHUNK = 4


def learn_merges_batched(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    vocab: DataFrame | None = None,
    max_batch: int = 8,
    scout: int = 32,
) -> list[tuple[int, str, int]]:
    """BPE training with PROVABLY-EQUAL batched rounds (VERDICT r6 #2
    / r7 next-round #3): returns byte-identical output to
    :func:`learn_merges`, but learns up to ``max_batch`` merges per
    pair-count job — the driver-paced job barrier per merge is the
    30k-merge production wall, and batching divides it.

    Per round, collect the top ``scout`` pairs and select the longest
    prefix that sequential BPE would provably pick unchanged:

    - **pairwise-disjoint**: each selected pair's extended symbol set
      {left, right, left+right} must not intersect any earlier
      selection's — merging one pair then cannot change another
      selected pair's count (counts only move for pairs touching the
      merged symbols);
    - **strictly above the conflict bound**: every selection after the
      first must beat max(first conflicting scouted pair, the
      scout-list floor) — decreased old pairs stay under their old
      count and every NEW pair (x, left+right) inherits at most the
      count of an old pair containing left or right, both ≤ the bound,
      so no competitor can reach a later selection's count;
    - **fresh merged symbol**: a selection whose left+right string
      already exists as a vocab symbol truncates the batch there (its
      new pairs would ADD to pre-existing counts, breaking the bound;
      checked with one vocabulary-sized distinct probe) — the first
      pick alone is always the verbatim sequential argmax.

    Ties need no care beyond strictness: selected counts are unchanged
    by in-batch merges and the (count desc, pair asc) walk preserves
    the sequential tie-break. Equality is pinned on randomized corpora
    in tests/test_bpe.py (batched-vs-sequential, multiple seeds).

    Scale: same vocabulary-sized rounds as :func:`learn_merges`; job
    count drops from 2·n_merges to ~n_merges·(2/batch + 1/4) (one
    scout + one symbol probe per batch, one chained projection
    checkpoint per 4 merges).

    Measured (sf0.1, local[32], 2026-08-15 — the r6/r7 carried
    merge-budget question): sequential training walls 7.0 s / 18.5 s /
    15.3 s at n_merges = 20 / 100 / 500; batched 6.2 s / 16.8 s /
    15.9 s, equal output at every budget. The synthetic sf0.1 corpus
    EXHAUSTS at 89 merges (random short words — both loops early-break
    there, which is why 500 costs the same as 100), so the practical
    bound is ~0.2 s per merge of driver-paced barriers: a 30k-merge
    production vocabulary costs ~100 driver-minutes sequentially and
    proportionally less batched — batching wins exactly when pair
    counts are Zipf-separated (real text), and degenerates safely to
    batch-of-1 sequential behavior in tie-dense regimes like this
    fixture."""
    if vocab is None:
        vocab = corpus_vocab(docs, text_col)
    vocab = vocab.select("syms", "freq")
    merges: list[tuple[int, str, int]] = []
    while len(merges) < n_merges:
        top = (
            pair_counts(vocab)
            .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
            .limit(scout)
            .collect()
        )
        if not top:
            break
        # any pair outside the scout list counts at most the list floor
        outside_bound = (
            int(top[-1]["n_occurrences"]) if len(top) == scout else 0
        )
        selected: list[tuple[str, int]] = []
        used: set[str] = set()
        conflict_bound = outside_bound
        cap = min(max_batch, n_merges - len(merges))
        for idx, r in enumerate(top):
            pair, n = r["pair"], int(r["n_occurrences"])
            left, right = pair.split(" ")
            ext = {left, right, left + right}
            if ext & used:
                # first (= highest-count) conflicting scouted pair
                conflict_bound = max(conflict_bound, n)
                break
            selected.append((pair, n))
            used |= ext
            if len(selected) >= cap:
                # batch cap hit BEFORE the scan found a conflict: the
                # unscanned scouted pairs may conflict too, and the
                # next pair's count bounds them all (descending scan) —
                # without this, a conflicting pair hiding past the cap
                # could seed a new pair that outsorts a later selection
                # in the sequential order (review r8 finding)
                if idx + 1 < len(top):
                    conflict_bound = max(
                        conflict_bound, int(top[idx + 1]["n_occurrences"])
                    )
                break
        # the first pick is the sequential argmax verbatim; later picks
        # must STRICTLY beat every count a batch merge could touch
        k = 1
        while k < len(selected) and selected[k][1] > conflict_bound:
            k += 1
        selected = selected[:k]
        if len(selected) > 1:
            ms = [p.replace(" ", "") for p, _ in selected]
            hits = {
                r["s"]
                for r in vocab.select(F.explode("syms").alias("s"))
                .where(F.col("s").isin(ms))
                .distinct()
                .collect()
            }
            for i, m in enumerate(ms):
                if m in hits:
                    selected = selected[: max(i, 1)]
                    break
        for i in range(0, len(selected), _APPLY_CHUNK):
            col = F.col("syms")
            for pair, _ in selected[i : i + _APPLY_CHUNK]:
                left, right = pair.split(" ")
                col = apply_merge_col(col, left, right)
            vocab = vocab.select(col.alias("syms"), "freq").localCheckpoint()
        for pair, n in selected:
            merges.append((len(merges), pair, n))
    return merges
