"""Tokenizer-training queries over ``documents`` (operators/bpe):
the corpus-sized pair-count pass is oracle-backed; the iterative
merge-learning loop is rows-only (a fixed-point driver loop is not one
DuckDB statement) and pinned against a pure-Python BPE reference in
tests/test_bpe.py.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators.bpe import (
    corpus_vocab,
    encode_token_counts,
    learn_merges_batched,
    pair_counts,
    word_fertility,
)
from ..sources.batch import load_table

_TOP_PAIRS = 100
_N_MERGES = 20

# Train-once / reuse-artifact: the merge table is deterministic per
# corpus (exact long counts, lexicographic tie-break), so queries in
# the same session share one learned table instead of each re-running
# the 20-round loop — the same session-scoped model cache the IVF
# index fit keeps (operators/similarity._ivf_cache), and the in-plan
# analogue of persisting the artifact (save/load_centroids pattern).
# Correctness is unaffected: every consumer would learn the identical
# table (pinned by the oracle replay and tests/test_bpe.py). The key
# carries a CORPUS FINGERPRINT (file sizes + mtimes, ADVICE r6): a
# path whose parquet is regenerated mid-process — the FIXTURES regen
# path, tmp-dir reuse in tests — gets retrained instead of silently
# serving merges learned on the old corpus.
_MERGES_CACHE: dict[tuple, list[tuple[int, str, int]]] = {}

# never-repeating token for corpora _corpus_fingerprint cannot stat
_UNSTAT_COUNTER = itertools.count()

# session-scoped artifact caches beside _MERGES_CACHE (r8): the
# corpus vocabulary (the ONE corpus-sized pass all tokenizer queries
# start from) and the encoded fertility map (vocabulary-sized, the
# broadcast side of every per-doc/per-lang fertility metric). Both are
# deterministic per corpus and keyed by the same fingerprint, so the
# regen-under-same-path retrain guarantee carries over; both hold
# localCheckpoint'ed vocabulary-sized tables (never corpus-sized).
_VOCAB_CACHE: dict[tuple, DataFrame] = {}
_FERTILITY_CACHE: dict[tuple, DataFrame] = {}


def _evict_stale(cache: dict, sf_dir: str, live_key: tuple) -> None:
    """Drop every cached entry for ``sf_dir`` other than ``live_key``:
    a corpus regenerated under the same path would otherwise pin its
    SUPERSEDED checkpointed tables (executor block storage, not tiny
    driver lists) for the whole session — the caches stay bounded at
    one corpus per path (review r8). The dropped DataFrames' blocks
    free when the ContextCleaner GCs the unreferenced RDDs."""
    for k in [k for k in cache if k[0] == sf_dir and k != live_key]:
        del cache[k]


def _corpus_vocab_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir))
    if key not in _VOCAB_CACHE:
        _evict_stale(_VOCAB_CACHE, sf_dir, key)
        _VOCAB_CACHE[key] = corpus_vocab(
            load_table(spark, sf_dir, "documents")
        )
    return _VOCAB_CACHE[key]


def _fertility_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _N_MERGES, _corpus_fingerprint(sf_dir))
    if key not in _FERTILITY_CACHE:
        _evict_stale(_FERTILITY_CACHE, sf_dir, key)
        voc = _corpus_vocab_cached(spark, sf_dir)
        merges = [
            p for _, p, _ in _learned_merges(spark, sf_dir, vocab=voc)
        ]
        docs = load_table(spark, sf_dir, "documents")
        _FERTILITY_CACHE[key] = word_fertility(
            docs, merges, vocab=voc
        ).localCheckpoint()
    return _FERTILITY_CACHE[key]


def _corpus_fingerprint(sf_dir: str) -> tuple:
    """Cheap content identity for ``sf_dir``'s documents table: the
    (name, size, mtime_ns) of the parquet file, or of every file under
    it when the table is a directory. Never reads data."""
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(path):
            out = []
            for root, _, files in os.walk(path):
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    rel = os.path.relpath(os.path.join(root, f), path)
                    out.append((rel, st.st_size, st.st_mtime_ns))
            return tuple(sorted(out))
        st = os.stat(path)
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        # missing path: let the Spark read raise the real error; an
        # un-statable corpus just never caches. The never-cache token
        # is a monotonic counter — NOT id(object()) (ADVICE r7:
        # CPython frees the temp object immediately and typically
        # reuses the address, so consecutive calls would return the
        # SAME key and a Spark-readable but un-statable corpus —
        # s3://, hdfs:// — would silently hit the stale cache again)
        return ("unstat", next(_UNSTAT_COUNTER))


def _learned_merges(
    spark: SparkSession, sf_dir: str, vocab=None
) -> list[tuple[int, str, int]]:
    key = (sf_dir, _N_MERGES, _corpus_fingerprint(sf_dir))
    if key not in _MERGES_CACHE:
        _evict_stale(_MERGES_CACHE, sf_dir, key)
        docs = load_table(spark, sf_dir, "documents")
        # the batched loop is provably output-equal to the sequential
        # one (tests/test_bpe.py randomized pins; the oracle replay
        # below re-proves it per corpus) and cuts the per-merge
        # driver-barrier count
        _MERGES_CACHE[key] = learn_merges_batched(
            docs, _N_MERGES, vocab=vocab
        )
    return _MERGES_CACHE[key]


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 0 of BPE training: the top adjacent character pairs by
    frequency-weighted occurrence count across the corpus vocabulary.

    Plan: one corpus scan → (word) shuffle with map-side partial
    aggregation (the vocabulary reduction — the only 100 TB-sized
    stage of tokenizer training) → a vocabulary-sized pair explode +
    (pair) aggregate → 100-row TakeOrderedAndProject. Overlapping
    positions each count ("aaa" contributes ("a","a") twice) — the
    standard BPE convention, and what the oracle reproduces.

    Deliberately UNCACHED (review r8): this query's whole point is to
    exhibit the corpus-sized pass, and it is the one tokenizer entry
    in the bench's round-over-round CLUSTERING_FAMILY — routing it
    through the session vocab cache would silently change what the
    committed trend measures."""
    vocab = corpus_vocab(load_table(spark, sf_dir, "documents"))
    return (
        pair_counts(vocab)
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(_TOP_PAIRS)
    )


ORACLE_BPE_PAIR_COUNTS = rf"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'),
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
    round, ever reaches the driver). FULLY oracle-backed since round
    6: the DuckDB oracle replays every round as a chained CTE
    (_bpe_rounds_cte) and emits each round's argmax — the hash check
    pins the whole training loop, upgraded from the r5 rows-only
    check. Also pinned against a pure-Python BPE reference in
    tests/test_bpe.py (exact long counts, lexicographic tie-break)."""
    merges = _learned_merges(
        spark, sf_dir, vocab=_corpus_vocab_cached(spark, sf_dir)
    )
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, n_occurrences long"
    ).orderBy("merge_rank")


def bpe_encoded_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE — the consumer of the trained artifact (VERDICT r5
    missing item 3): learn the _N_MERGES merge table, tokenize the
    whole corpus with it (operators/bpe.encode_token_counts — apply
    each merge in rank order to the distinct-word table), and emit the
    corpus token histogram (token, n_tokens), frequency-weighted.

    Scale shape: training + encoding together are ONE corpus-sized
    scan (the word-frequency aggregation) plus 2·n_merges
    vocabulary-sized rounds; the histogram aggregate shuffles
    vocabulary-sized rows. FULLY oracle-backed despite the iterative
    loop: the DuckDB oracle replays every learning round as a chained
    CTE (pair argmax, then a non-overlapping left-to-right merge via
    literal ``replace`` over a double-space-wrapped symbol string) —
    the hash check therefore proves learning AND encoding end-to-end,
    not just the final arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    voc = _corpus_vocab_cached(spark, sf_dir)
    merges = _learned_merges(spark, sf_dir, vocab=voc)
    return (
        encode_token_counts(docs, [p for _, p, _ in merges], vocab=voc)
        .orderBy("token")
    )


def _bpe_rounds_cte() -> str:
    """Replay _N_MERGES BPE rounds in SQL (the WITH-clause prefix
    shared by the learned-merges and encoded-token oracles). Symbol
    arrays are encoded as double-space-joined strings wrapped in
    single spaces (" a  b  c "): a merge of (left, right) is then the
    literal replace of " left  right " with " leftright " —
    non-overlapping left-to-right, exactly apply_merge_col's fold
    semantics (DuckDB replace() consumes the shared separator, so
    "a a a" merges to [aa, a], never [aa, aa]). MATERIALIZED pins each
    round's vocab (each is referenced by both the next round's pair
    counts and its merge application — inlining would re-run every
    prior round per reference). An exhausted round (no pairs left)
    yields an empty best{r}; the LEFT JOIN + chr(1) sentinel makes its
    merge a no-op, mirroring learn_merges' early break."""
    chars = (
        "' ' || array_to_string(list_transform(generate_series(1, "
        "len(word)), i -> substring(word, i, 1)), '  ') || ' '"
    )
    parts = [
        rf"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'),
                            x -> len(x) > 0)) AS word
  FROM documents
),
wf AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
vocab0 AS MATERIALIZED (SELECT word, {chars} AS s, freq FROM wf)"""
    ]
    for r in range(1, _N_MERGES + 1):
        parts.append(
            f""",
pc{r} AS (
  SELECT t.pair, SUM(t.freq) AS n FROM (
    SELECT unnest(list_transform(range(1, len(syms)),
                                 i -> syms[i] || ' ' || syms[i + 1]))
             AS pair,
           freq
    FROM (SELECT string_split(trim(s), '  ') AS syms, freq
          FROM vocab{r - 1})
    WHERE len(syms) >= 2
  ) t GROUP BY t.pair
),
best{r} AS (SELECT pair, n FROM pc{r} ORDER BY n DESC, pair ASC LIMIT 1),
vocab{r} AS MATERIALIZED (
  SELECT word,
         replace(s,
                 ' ' || replace(coalesce(b.pair, chr(1)), ' ', '  ')
                     || ' ',
                 ' ' || replace(coalesce(b.pair, chr(1)), ' ', '')
                     || ' ') AS s,
         freq
  FROM vocab{r - 1} LEFT JOIN best{r} b ON TRUE
)"""
        )
    return "".join(parts)


ORACLE_BPE_ENCODED = (
    _bpe_rounds_cte()
    + f"""
SELECT token, CAST(SUM(freq) AS BIGINT) AS n_tokens
FROM (SELECT unnest(string_split(trim(s), '  ')) AS token, freq
      FROM vocab{_N_MERGES})
GROUP BY token ORDER BY token
"""
)

def bpe_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per document (round 6): token count, word
    count, and characters-per-token compression for every document
    under the learned merge table — the metric a tokenizer-aware
    mixing/packing stage budgets with (sequence lengths) and the
    standard way to compare tokenizer quality across languages.

    Scale shape: the fertility map (word → token count) is
    vocabulary-sized and BROADCAST; the corpus-sized side is one
    word-explode + map-side join + per-doc aggregate — the corpus
    never shuffles by word. The compression ratio is one division of
    two exact integers (bit-identical across engines). The oracle
    replays the learning rounds (chained CTEs, word carried through)
    and re-derives the same fertility map in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    fert = _fertility_cached(spark, sf_dir)
    words = docs.select(
        "doc_id",
        F.explode(tx.tokens_col(F.lower(F.col("text")))).alias("word"),
    )
    return (
        words.join(F.broadcast(fert), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum(F.length("word")).alias("_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.round(
                F.col("_chars").cast("double") / F.col("n_tokens"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


ORACLE_BPE_DOC_TOKEN_COUNTS = (
    _bpe_rounds_cte()
    + rf""",
word_toks AS (
  SELECT word, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_toks
  FROM vocab{_N_MERGES}
),
docw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'),
                            x -> len(x) > 0)) AS word
  FROM documents
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(w.n_toks) AS BIGINT) AS n_tokens,
       round(sum(len(d.word)) / CAST(sum(w.n_toks) AS DOUBLE), 6)
         AS chars_per_token
FROM docw d JOIN word_toks w USING (word)
GROUP BY d.doc_id ORDER BY d.doc_id
"""
)


def bpe_lang_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer EQUITY across languages (round 6): per language, the
    tokens-per-word and characters-per-token fertility under the
    single corpus-trained merge table — the standard multilingual
    tokenizer audit (a language with high fertility pays more sequence
    positions per unit of text, so mixing weights and context budgets
    must correct for it).

    Same scale shape as ``bpe_doc_token_counts`` — vocabulary-sized
    broadcast fertility map, corpus-sized word explode, enum-sized
    output — aggregated by language instead of document. Ratios are
    single divisions of exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    fert = _fertility_cached(spark, sf_dir)
    words = docs.select(
        "lang",
        F.explode(tx.tokens_col(F.lower(F.col("text")))).alias("word"),
    )
    return (
        words.join(F.broadcast(fert), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum(F.length("word")).alias("_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_words"), 6
            ).alias("tokens_per_word"),
            F.round(
                F.col("_chars").cast("double") / F.col("n_tokens"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


ORACLE_BPE_LANG_FERTILITY = (
    _bpe_rounds_cte()
    + rf""",
word_toks AS (
  SELECT word, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_toks
  FROM vocab{_N_MERGES}
),
docw AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'),
                            x -> len(x) > 0)) AS word
  FROM documents
)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(w.n_toks) AS BIGINT) AS n_tokens,
       round(sum(w.n_toks) / CAST(count(*) AS DOUBLE), 6)
         AS tokens_per_word,
       round(sum(len(d.word)) / CAST(sum(w.n_toks) AS DOUBLE), 6)
         AS chars_per_token
FROM docw d JOIN word_toks w USING (word)
GROUP BY d.lang ORDER BY d.lang
"""
)


def mixing_weights_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing weights (VERDICT r6 #3 / r7 next-round #4):
    per language, BOTH the document-count and the TOKEN-count shares
    with their temperature-rebalanced (α = 1/2) upsample factors side
    by side. An LLM pipeline budgets sequence POSITIONS, not
    documents: a high-fertility language (more tokens per word under
    the shared corpus-trained BPE table) occupies more of the token
    budget than its document share suggests, so the docs-based
    ``upsample_docs`` over- or under-samples it — ``upsample_tokens``
    is the factor that actually equalizes compute. Temperature uses
    sqrt (α pinned at 1/2 — the one power IEEE 754 requires correctly
    rounded; same no-transcendentals rule as mixing_weights_temperature).

    Shape: the merge table and fertility map are learned from the FULL
    corpus (identical artifact to bpe_lang_fertility — the session
    merge cache stays consistent); the per-language aggregates are one
    corpus scan each (word explode + broadcast fertility join; plain
    doc count); everything after is enum-sized, folded in lang-sorted
    order via the single-row pack (the mixing_weights_temperature
    pattern). NULL langs excluded on both sides (an unlabeled document
    has no language to weight; and sort_array vs ORDER BY NULL
    placement would silently flip the fold order). ``upsample_tokens``
    is NULL for a language with zero in-vocabulary tokens (q/p is
    undefined at p = 0) — mirrored by the oracle's CASE."""
    docs = load_table(spark, sf_dir, "documents")
    fert = _fertility_cached(spark, sf_dir)
    labeled = docs.where(F.col("lang").isNotNull())
    tok = (
        labeled.select(
            "lang",
            F.explode(tx.tokens_col(F.lower(F.col("text")))).alias("word"),
        )
        .join(F.broadcast(fert), "word")
        .groupBy("lang")
        .agg(F.sum("n_toks").alias("n_tokens"))
    )
    counts = (
        labeled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(tok, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
        )
    )
    packed = counts.agg(
        F.sort_array(
            F.collect_list(F.struct("lang", "n_docs", "n_tokens"))
        ).alias("a")
    )
    row = packed.select(
        F.aggregate(
            "a", F.lit(0.0), lambda acc, s: acc + F.sqrt(s["n_docs"])
        ).alias("_dsqd"),
        F.aggregate(
            "a", F.lit(0.0), lambda acc, s: acc + F.sqrt(s["n_tokens"])
        ).alias("_dsqt"),
        F.aggregate(
            "a", F.lit(0).cast("long"), lambda acc, s: acc + s["n_docs"]
        ).alias("_ndtot"),
        F.aggregate(
            "a", F.lit(0).cast("long"), lambda acc, s: acc + s["n_tokens"]
        ).alias("_nttot"),
        F.explode("a").alias("x"),
    )
    nd = F.col("x.n_docs").cast("double")
    nt = F.col("x.n_tokens").cast("double")
    doc_share = nd / F.col("_ndtot")
    token_share = nt / F.col("_nttot")
    up_docs = (F.sqrt(nd) / F.col("_dsqd")) / doc_share
    up_tokens = (F.sqrt(nt) / F.col("_dsqt")) / token_share
    return row.select(
        F.col("x.lang").alias("lang"),
        F.col("x.n_docs").alias("n_docs"),
        F.col("x.n_tokens").alias("n_tokens"),
        F.round(doc_share, 6).alias("doc_share"),
        F.round(token_share, 6).alias("token_share"),
        F.round(up_docs, 6).alias("upsample_docs"),
        F.when(
            F.col("x.n_tokens") > 0, F.round(up_tokens, 6)
        ).alias("upsample_tokens"),
    ).orderBy("lang")


ORACLE_MIXING_TOKEN_BUDGET = (
    _bpe_rounds_cte()
    + rf""",
word_toks AS (
  SELECT word, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_toks
  FROM vocab{_N_MERGES}
),
docw AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'),
                            x -> len(x) > 0)) AS word
  FROM documents WHERE lang IS NOT NULL
),
toks AS (
  SELECT d.lang, SUM(w.n_toks) AS n_tokens
  FROM docw d JOIN word_toks w USING (word) GROUP BY d.lang
),
nd AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
),
c AS (
  SELECT nd.lang, nd.n_docs,
         COALESCE(t.n_tokens, CAST(0 AS BIGINT)) AS n_tokens
  FROM nd LEFT JOIN toks t USING (lang)
),
packed AS (
  SELECT list(n_docs ORDER BY lang) AS nds,
         list(n_tokens ORDER BY lang) AS nts
  FROM c
),
denom AS (
  SELECT list_reduce(list_prepend(0.0,
           list_transform(nds, x -> sqrt(CAST(x AS DOUBLE)))),
           (a, b) -> a + b) AS dsqd,
         list_reduce(list_prepend(0.0,
           list_transform(nts, x -> sqrt(CAST(x AS DOUBLE)))),
           (a, b) -> a + b) AS dsqt,
         list_reduce(list_prepend(CAST(0 AS BIGINT), nds),
           (a, b) -> a + b) AS ndtot,
         list_reduce(list_prepend(CAST(0 AS BIGINT), nts),
           (a, b) -> a + b) AS nttot
  FROM packed
)
SELECT c.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
       CAST(c.n_tokens AS BIGINT) AS n_tokens,
       round(c.n_docs / CAST(d.ndtot AS DOUBLE), 6) AS doc_share,
       round(c.n_tokens / CAST(d.nttot AS DOUBLE), 6) AS token_share,
       round((sqrt(CAST(c.n_docs AS DOUBLE)) / d.dsqd)
             / (c.n_docs / CAST(d.ndtot AS DOUBLE)), 6) AS upsample_docs,
       CASE WHEN c.n_tokens > 0 THEN
         round((sqrt(CAST(c.n_tokens AS DOUBLE)) / d.dsqt)
               / (c.n_tokens / CAST(d.nttot AS DOUBLE)), 6)
       END AS upsample_tokens
FROM c CROSS JOIN denom d ORDER BY c.lang
"""
)


ORACLE_BPE_LEARNED_MERGES = (
    _bpe_rounds_cte()
    + "\nSELECT merge_rank, pair, n_occurrences FROM (\n"
    + "\nUNION ALL\n".join(
        f"  SELECT CAST({r - 1} AS INT) AS merge_rank, pair,"
        f" CAST(n AS BIGINT) AS n_occurrences FROM best{r}"
        for r in range(1, _N_MERGES + 1)
    )
    + "\n) ORDER BY merge_rank\n"
)


# coverage-curve depth: enough to exhibit the Zipf knee, bounded so
# the cumulative window runs over a fixed-size frame
_COVERAGE_TOP = 200


def bpe_token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve of the deployed tokenizer (r8): the
    top tokens of the encoded-corpus histogram ranked by frequency,
    each with its share and the CUMULATIVE share of all token
    positions — the audit that sizes a vocabulary budget ("the top k
    tokens cover X% of positions") and exposes Zipf-tail waste.

    Scale shape: the histogram is the vocabulary-sized output of the
    shared encode (one corpus scan through the cached artifacts); the
    top slice is a TakeOrderedAndProject (never a full sort); the
    cumulative window then runs over exactly _COVERAGE_TOP rows (a
    bounded single-partition frame, the same exemption as the
    mixing-weight pack); the grand total is a 1-row scalar broadcast.
    Cumulative sums are exact longs, so shares are single divisions of
    exact integers — deterministic on both engines."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    voc = _corpus_vocab_cached(spark, sf_dir)
    merges = _learned_merges(spark, sf_dir, vocab=voc)
    hist = encode_token_counts(
        docs, [p for _, p, _ in merges], vocab=voc
    )
    top = (
        hist.orderBy(F.col("n_tokens").desc(), F.col("token").asc())
        .limit(_COVERAGE_TOP)
    )
    total = hist.agg(F.sum("n_tokens").alias("_total"))
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("token").asc())
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col("_total").cast("double")
    return (
        top.join(total)
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "n_tokens",
            F.round(F.col("n_tokens") / t, 6).alias("share"),
            F.round(cum / t, 6).alias("cum_share"),
        )
        .orderBy("rank")
    )


ORACLE_BPE_COVERAGE = (
    _bpe_rounds_cte()
    + f""",
hist AS (
  SELECT token, CAST(SUM(freq) AS BIGINT) AS n_tokens
  FROM (SELECT unnest(string_split(trim(s), '  ')) AS token, freq
        FROM vocab{_N_MERGES})
  GROUP BY token
),
total AS (SELECT SUM(n_tokens) AS t FROM hist),
top AS (
  SELECT token, n_tokens,
         CAST(row_number() OVER (ORDER BY n_tokens DESC, token ASC)
              AS INT) AS rank
  FROM hist ORDER BY n_tokens DESC, token ASC LIMIT {_COVERAGE_TOP}
)
SELECT rank, token, n_tokens,
       round(n_tokens / CAST(t.t AS DOUBLE), 6) AS share,
       round(sum(n_tokens) OVER (ORDER BY rank) / CAST(t.t AS DOUBLE), 6)
         AS cum_share
FROM top CROSS JOIN total t ORDER BY rank
"""
)
