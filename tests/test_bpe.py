"""operators/bpe vs a pure-Python Sennrich-style reference: same
overlapping pair counts, same non-overlapping left-to-right merges,
same (count desc, pair asc) tie-break → identical learned merge
tables."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.bpe import (
    apply_merge_col,
    encode_token_counts,
    learn_merges,
    pair_counts,
    word_frequencies,
)


# --- pure-Python reference (classic dict-based BPE) -------------------------


def _ref_word_freqs(texts: list[str]) -> dict[tuple[str, ...], int]:
    freqs: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            freqs[tuple(w)] += 1
    return dict(freqs)


def _ref_pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    counts: Counter = Counter()
    for syms, f in vocab.items():
        for a, b in zip(syms, syms[1:]):  # overlapping positions
            counts[(a, b)] += f
    return counts


def _ref_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2  # non-overlapping, left-to-right
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_learn(texts: list[str], n_merges: int):
    vocab = _ref_word_freqs(texts)
    merges = []
    for rank in range(n_merges):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        pair, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, f"{pair[0]} {pair[1]}", n))
        vocab = {_ref_merge(s, pair): f for s, f in vocab.items()}
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the banana bandana was abandoned",
    "aaa aaaa aa aaa",  # overlapping-count / non-overlapping-merge trap
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_learned_merges_match_reference(spark):
    got = learn_merges(_docs(spark), 10)
    assert got == _ref_learn(TEXTS, 10)
    assert len(got) == 10


def test_learn_stops_when_pairs_exhaust(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    got = learn_merges(docs, 5)
    # round 0 merges (a,b) -> "ab"; afterwards every word is a single
    # symbol and no adjacent pair exists
    assert got == [(0, "a b", 2)]


def test_pair_counts_weighted_and_overlapping(spark):
    vocab = word_frequencies(_docs(spark)).select(
        F.transform(
            F.sequence(F.lit(1), F.char_length("word")),
            lambda i: F.substring("word", i, F.lit(1)),
        ).alias("syms"),
        "freq",
    )
    got = {
        r["pair"]: r["n_occurrences"] for r in pair_counts(vocab).collect()
    }
    want = {
        f"{a} {b}": n
        for (a, b), n in _ref_pair_counts(_ref_word_freqs(TEXTS)).items()
    }
    assert got == want
    # "aaa" (freq 2) + "aaaa" (1) + "aa" (1): positions 2*2 + 3 + 1
    assert got["a a"] == 8


def test_apply_merge_is_left_to_right_non_overlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "a", "a"],)], "syms array<string>"
    )
    out = df.select(
        apply_merge_col(F.col("syms"), "a", "a").alias("m")
    ).head()["m"]
    assert out == ["aa", "aa", "a"]


def _ref_encode_token_counts(
    texts: list[str], merges: list[str]
) -> dict[str, int]:
    vocab = _ref_word_freqs(texts)
    for pair in merges:
        left, right = pair.split(" ")
        vocab = {_ref_merge(s, (left, right)): f for s, f in vocab.items()}
    counts: Counter = Counter()
    for syms, f in vocab.items():
        for s in syms:
            counts[s] += f
    return dict(counts)


def test_encode_token_counts_matches_reference(spark):
    """The ENCODE consumer of the trained artifact: tokenizing the
    training corpus with its own learned merges equals the pure
    reference (and equals the final training vocab, by construction)."""
    merges = [p for _, p, _ in _ref_learn(TEXTS, 10)]
    got = {
        r["token"]: r["n_tokens"]
        for r in encode_token_counts(_docs(spark), merges).collect()
    }
    assert got == _ref_encode_token_counts(TEXTS, merges)


def test_encode_applies_learned_merges_to_unseen_corpus(spark):
    """Deploy-time path: a merge table trained on one corpus encodes a
    DIFFERENT corpus (unseen words, partial merge applicability) in
    rank order, matching the reference fold word-for-word."""
    merges = [p for _, p, _ in _ref_learn(TEXTS, 10)]
    unseen = ["slowest news low aal", "widest ban dan aaaa z"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(unseen)], "doc_id long, text string"
    )
    got = {
        r["token"]: r["n_tokens"]
        for r in encode_token_counts(docs, merges).collect()
    }
    assert got == _ref_encode_token_counts(unseen, merges)


def test_encode_vocab_runs_match_one_at_a_time(spark):
    """Run-batched encoding (one apply_merges_col pass per maximal
    pairwise-disjoint run, r9) must equal applying the ranked merges
    strictly one per checkpointed pass — the sequential semantics the
    merge artifact defines. The legacy ``chunk`` argument is ignored
    and must not change the result."""
    from in_stream_processing_course_spark.operators.bpe import (
        corpus_vocab,
        encode_vocab,
    )

    merges = [p for _, p, _ in _ref_learn(TEXTS, 8)]
    vocab = corpus_vocab(_docs(spark)).select("word", "syms")
    one_at_a_time = vocab
    for pair in merges:
        left, right = pair.split(" ")
        one_at_a_time = one_at_a_time.select(
            "word",
            apply_merge_col(F.col("syms"), left, right).alias("syms"),
        ).localCheckpoint()
    want = {
        r["word"]: tuple(r["syms"]) for r in one_at_a_time.collect()
    }
    for c in (1, 3, 99):
        got = {
            r["word"]: tuple(r["syms"])
            for r in encode_vocab(vocab, merges, chunk=c).collect()
        }
        assert got == want


def test_apply_merges_col_equals_chained_singles(spark):
    """One fold pass over a pairwise-disjoint batch == chaining the
    single-pair folds, on randomized symbol arrays — the equivalence
    learn_merges_batched and the run-based encode stand on."""
    import random

    from in_stream_processing_course_spark.operators.bpe import (
        apply_merges_col,
    )

    rng = random.Random(41)
    # disjoint batch over the alphabet {a..f}: ext sets don't overlap
    batch = [("a", "b"), ("c", "c"), ("d", "e")]
    rows = [
        (i, [rng.choice("abcdef") for _ in range(rng.randint(0, 14))])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, syms array<string>")
    got = {
        r["id"]: tuple(r["syms"])
        for r in df.select(
            "id", apply_merges_col(F.col("syms"), batch).alias("syms")
        ).collect()
    }
    chained = F.col("syms")
    for left, right in batch:
        chained = apply_merge_col(chained, left, right)
    want = {
        r["id"]: tuple(r["syms"])
        for r in df.select("id", chained.alias("syms")).collect()
    }
    assert got == want
    # and in reversed batch order — disjointness makes order irrelevant
    chained_rev = F.col("syms")
    for left, right in reversed(batch):
        chained_rev = apply_merge_col(chained_rev, left, right)
    want_rev = {
        r["id"]: tuple(r["syms"])
        for r in df.select("id", chained_rev.alias("syms")).collect()
    }
    assert got == want_rev


def test_disjoint_runs_properties():
    from in_stream_processing_course_spark.operators.bpe import (
        disjoint_runs,
    )

    merges = ["a b", "c d", "ab c", "e f", "g h", "ef g"]
    runs = disjoint_runs(merges)
    # order-preserving partition of the input
    flat = [f"{left} {right}" for run in runs for left, right in run]
    assert flat == merges
    # each run pairwise-disjoint on extended symbol sets
    for run in runs:
        seen: set[str] = set()
        for left, right in run:
            ext = {left, right, left + right}
            assert not (ext & seen)
            seen |= ext
    # the crafted conflicts break exactly where they must:
    # "ab c" consumes "a b"'s output; "ef g" consumes "e f"'s
    assert runs == [
        [("a", "b"), ("c", "d")],
        [("ab", "c"), ("e", "f"), ("g", "h")],
        [("ef", "g")],
    ]


def test_word_fertility_matches_reference(spark):
    """The fertility map (word -> encoded token count) — the
    vocabulary-sized broadcast side of per-document tokenizer
    metrics — equals a per-word reference encode."""
    from in_stream_processing_course_spark.operators.bpe import (
        word_fertility,
    )

    merges = [p for _, p, _ in _ref_learn(TEXTS, 10)]
    got = {
        r["word"]: r["n_toks"]
        for r in word_fertility(_docs(spark), merges).collect()
    }
    want = {}
    for w in {w for t in TEXTS for w in t.lower().split()}:
        syms = tuple(w)
        for pair in merges:
            left, right = pair.split(" ")
            syms = _ref_merge(syms, (left, right))
        want[w] = len(syms)
    assert got == want


def test_apply_merge_randomized_against_reference(spark):
    """200 adversarial symbol arrays (alphabet {a, b, ab} — merged
    symbols collide with literal ones, overlap chains, pair-at-end),
    one Spark job, row-wise equality with the pure reference fold."""
    import random

    rng = random.Random(0)
    arrays = [
        tuple(rng.choice(["a", "b", "ab"]) for _ in range(rng.randint(0, 8)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, list(a)) for i, a in enumerate(arrays)],
        "i long, syms array<string>",
    )
    got = {
        r["i"]: tuple(r["m"])
        for r in df.select(
            "i", apply_merge_col(F.col("syms"), "a", "b").alias("m")
        ).collect()
    }
    for i, a in enumerate(arrays):
        assert got[i] == _ref_merge(a, ("a", "b")), (i, a)


def test_batched_learn_equals_sequential_on_fixture(spark):
    """learn_merges_batched must return byte-identical (rank, pair,
    count) triples to the sequential loop — including the early-break
    corpus (batch safety gates must never overrun exhaustion)."""
    from in_stream_processing_course_spark.operators.bpe import (
        learn_merges_batched,
    )

    docs = _docs(spark)
    assert learn_merges_batched(docs, 10) == learn_merges(docs, 10)
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    assert learn_merges_batched(tiny, 5) == [(0, "a b", 2)]


def test_batched_learn_equals_sequential_randomized(spark):
    """Randomized corpora over a small alphabet (dense pair-count ties,
    merged-symbol collisions, conflict chains — the adversarial regime
    for the batch-safety bounds): batched == sequential == the pure
    reference, for several seeds. This is the provably-equal pin the
    round-7 docstring claimed (VERDICT r7 wrong #2)."""
    import random

    from in_stream_processing_course_spark.operators.bpe import (
        learn_merges_batched,
    )

    for seed in range(4):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(
                    rng.choice("abcd") for _ in range(rng.randint(1, 6))
                )
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(8)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        seq = learn_merges(docs, 12)
        bat = learn_merges_batched(docs, 12)
        assert bat == seq, (seed, texts)
        assert seq == _ref_learn(texts, 12), seed


def test_batched_learn_cap_path_stays_sequential(spark):
    """Regression (r8 review): when the batch CAP truncates the scan
    before any conflict is seen, an unscanned conflicting pair can
    spawn a new pair that outsorts a later selection — 'azw' merges
    (a,z) into 'az', and the new pair 'az w' sorts lexicographically
    BEFORE the selected (c,d) at equal count, so sequential picks it
    second while an unbounded batch would emit (c,d). The cap path
    must bound later selections by the first unscanned count."""
    from in_stream_processing_course_spark.operators.bpe import (
        learn_merges_batched,
    )

    texts = [
        "az az az az",
        "azw azw azw azw azw azw",
        "cd cd cd cd cd cd",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = learn_merges(docs, 3)
    # sequential: (a z), then the SPAWNED (az w), then (c d)
    assert [p for _, p, _ in seq] == ["a z", "az w", "c d"]
    assert learn_merges_batched(docs, 3, max_batch=2) == seq
