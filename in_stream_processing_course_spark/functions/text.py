"""Text-analysis Column builders (north-star X3) — all native
``pyspark.sql.functions`` so they run JVM-side inside codegen; no
Python in the hot path. Each has an exact DuckDB-SQL equivalent used
as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic marker vocabularies for the n-gram/stopword language-ID
# heuristic. Real corpora would use character n-gram profiles; the
# mechanism (score-per-language, argmax with fixed tiebreak) is what
# matters and is identical at any vocabulary size.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "des"),
    "es": ("el", "la", "los", "que", "y"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # argmax tiebreak order

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish token: runs of word chars, or a single non-space symbol —
# approximates subword pretokenization (GPT-2 style pretokenizer has
# the same "word run | single punct" shape).
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def bpe_token_count_col(text: Column) -> Column:
    """Count of BPE-ish pretokens via regexp_count (JVM regex)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def marker_hits_col(
    text: Column, markers: tuple[str, ...], toks: Column | None = None
) -> Column:
    """How many tokens of ``text`` are in ``markers`` (exact token match).

    Pass ``toks`` (a pre-projected lowercased token array column) to
    avoid re-tokenizing — Catalyst cannot CSE the split across lambda
    scopes, so inline tokenization is recomputed per consumer.
    """
    if toks is None:
        toks = tokens_col(F.lower(text))
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def lang_id_col(text: Column, toks: Column | None = None) -> Column:
    """Argmax language over marker-hit scores, fixed tiebreak LANG_ORDER."""
    expr: Column | None = None
    best: Column | None = None
    for lang in LANG_ORDER:
        score = marker_hits_col(text, LANG_MARKERS[lang], toks)
        if expr is None:
            expr, best = F.lit(lang), score
        else:
            gt = score > best
            expr = F.when(gt, F.lit(lang)).otherwise(expr)
            best = F.when(gt, score).otherwise(best)
    return expr


def char_ngrams_col(text: Column, n: int = 3) -> Column:
    """Character n-grams of ``text`` as an array (empty when the text
    is shorter than n — guarded explicitly: Spark's sequence(1, 0)
    counts DOWN, so an unguarded expression would walk phantom
    indices). Scan-local, no explode, no shuffle."""
    grams = F.transform(
        F.sequence(F.lit(1), F.char_length(text) - (n - 1)),
        lambda i: F.substring(text, i, F.lit(n)),
    )
    return F.when(F.char_length(text) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio_col(text: Column, toks: Column | None = None) -> Column:
    """stopword tokens / all tokens, double division (guard empty)."""
    if toks is None:
        toks = tokens_col(F.lower(text))
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio_col(text: Column) -> Column:
    """non-alphanumeric-non-space chars / all chars."""
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def quality_score_col(text: Column, toks: Column | None = None) -> Column:
    """Composite quality heuristic in [0, ~1]: rewards length (capped),
    penalizes punctuation soup, rewards stopword presence (natural
    language signal). Deterministic integer-ratio arithmetic so the
    DuckDB oracle matches to full double precision.
    """
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio_col(text, toks) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio_col(text) * 4, F.lit(1.0))
    return F.round(
        length_term * 0.4 + stop_term * 0.4 + punct_term * 0.2, 6
    )


def fingerprint_col(text: Column, prefix_len: int = 256, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash (Rabin-Karp) over the first ``prefix_len``
    chars: ``h = (h*31 + ascii(c)) % mod``. Pure Column algebra via
    aggregate over the char array — portable to any SQL engine with a
    list-reduce, which is exactly how the oracle computes it.
    """
    chars = F.split(F.substring(text, 1, prefix_len), "")
    codes = F.transform(F.filter(chars, lambda c: F.length(c) > 0), F.ascii)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x.cast("long")) % F.lit(mod).cast("long"),
    )


def ngrams_col(toks: Column, n: int) -> Column:
    """Adjacent token n-grams as space-joined strings (empty array when
    the text has fewer than ``n`` tokens). Built from n shifted slices
    zip-folded with concat — scan-local, no explode, no shuffle."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, F.lit(1), length)
    for i in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, F.lit(i + 1), length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return out


def top_token_count_col(toks: Column) -> Column:
    """Count of the most frequent token, computed IN-ROW: sort the
    token array (equal tokens become adjacent) and fold a longest-run
    counter. O(len·log len) per document and fully scan-local — the
    100 TB form of "mode per document", vs. exploding the corpus's
    token stream through a (doc, term) shuffle. 0 for an empty array
    (tokens are never the empty string, so the '' seed cannot collide)."""
    longzero = F.lit(0).cast("long")

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            longzero.alias("run"),
            longzero.alias("best"),
        ),
        step,
        lambda acc: acc["best"],
    )
