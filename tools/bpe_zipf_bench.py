#!/usr/bin/env python
"""Zipf-realistic BPE merge-budget measurement (VERDICT r8 next-round
#3): the r8 walls were right-censored — the driver's synthetic sf0.1
corpus EXHAUSTS at 89 merges (random short words), so the 500-merge
wall and the batching win on Zipf-separated counts were extrapolated.
This tool synthesizes a Heaps/Zipf-shaped corpus (Zipf rank-frequency
over word types; English-ish letter distribution inside types, so
adjacent-pair counts separate the way real text does), validates the
shape with the registered ``corpus_vocab_growth`` machinery, and
measures ``learn_merges`` (sequential) vs ``learn_merges_batched`` at
n_merges in {500, 2000}, asserting byte-identical output.

Usage: python tools/bpe_zipf_bench.py [--batched-only] [n_docs]
           [tokens_per_doc] [budgets]
where budgets is a comma list of n_merges values (default "500,2000")
and ``--batched-only`` (position-independent) skips the sequential
twin — right for deep budgets where byte-equality is already pinned.
Per-1000-merge milestone walls are printed for every budget (VERDICT
r9 next-round #4: pull the 30k extrapolation within one order of
magnitude of measurement). Writes nothing outside /tmp; commit the
printed numbers into operators/bpe.py's docstring and the round
evidence.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from in_stream_processing_course_spark.operators.bpe import (
    learn_merges,
    learn_merges_batched,
    corpus_vocab,
)
from in_stream_processing_course_spark.session import get_spark

# English-ish letter distribution — what makes pair counts separate
_LETTERS = np.array(list("etaoinshrdlcumwfgypbvkjxqz"))
_LETTER_P = np.array(
    [12.7, 9.1, 8.2, 7.5, 7.0, 6.7, 6.3, 6.1, 6.0, 4.3, 4.0, 2.8, 2.8,
     2.4, 2.4, 2.2, 2.0, 2.0, 1.9, 1.5, 1.0, 0.8, 0.15, 0.15, 0.1, 0.07]
)
_LETTER_P = _LETTER_P / _LETTER_P.sum()

_N_TYPES = 30_000
_ZIPF_S = 1.07  # classic natural-language exponent


def make_corpus(spark, n_docs: int, toks_per_doc: int, seed: int = 9):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(3, 12, size=_N_TYPES)
    types = [
        "".join(rng.choice(_LETTERS, size=n, p=_LETTER_P))
        for n in lengths
    ]
    ranks = np.arange(1, _N_TYPES + 1, dtype=np.float64)
    p = ranks ** (-_ZIPF_S)
    p /= p.sum()
    rows = []
    for d in range(n_docs):
        idx = rng.choice(_N_TYPES, size=toks_per_doc, p=p)
        rows.append((d, " ".join(types[i] for i in idx)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> int:
    # flags are position-independent: strip them before positional
    # parsing so "--batched-only 10000" doesn't crash int() (ADVICE r11)
    batched_only = "--batched-only" in sys.argv[1:]
    argv = [a for a in sys.argv[1:] if a != "--batched-only"]
    n_docs = int(argv[0]) if len(argv) > 0 else 4000
    toks = int(argv[1]) if len(argv) > 1 else 150
    # training rounds are vocabulary-sized and driver-paced — 8 shuffle
    # partitions cuts per-round scheduling overhead without changing
    # what is measured (the per-merge job barrier)
    spark = get_spark("bpe-zipf-bench", shuffle_partitions="8")
    t0 = time.perf_counter()
    docs = make_corpus(spark, n_docs, toks)
    docs = docs.localCheckpoint()
    print(
        f"corpus: {n_docs} docs x {toks} tokens, {_N_TYPES} Zipf types "
        f"(s={_ZIPF_S}), built in {time.perf_counter() - t0:.1f}s"
    )
    # Heaps validation: distinct-word growth along the doc_id order
    vocab = corpus_vocab(docs)
    n_types = vocab.count()
    total_tokens = n_docs * toks
    print(
        f"heaps check: {n_types} observed types over {total_tokens} tokens "
        f"(type/token {n_types / total_tokens:.4f})"
    )
    budgets = (
        [int(x) for x in argv[2].split(",")]
        if len(argv) > 2
        else [500, 2000]
    )

    def milestone_hook(tag, t_start):
        seen = {"next": 1000}

        def hook(count):
            if count >= seen["next"]:
                print(
                    f"  [{tag}] {count} merges at "
                    f"{time.perf_counter() - t_start:.1f}s",
                    flush=True,
                )
                seen["next"] = (count // 1000 + 1) * 1000

        return hook

    # --batched-only (r11): past the 5k budget the sequential twin
    # doubles the wall for no new information — byte-equality of the
    # two learners is already pinned at 500/2000/5000 merges; deep
    # budgets measure the DEPLOY path (batched) alone
    for n in budgets:
        if batched_only:
            t = time.perf_counter()
            bat = learn_merges_batched(
                docs, n, vocab=vocab, progress=milestone_hook("bat", t)
            )
            t_bat = time.perf_counter() - t
            print(
                f"n_merges={n}: batched {t_bat:.1f}s "
                f"({t_bat / max(len(bat), 1):.3f}s/merge), "
                f"learned {len(bat)} merges (batched-only run)"
            )
            continue
        t = time.perf_counter()
        seq = learn_merges(docs, n, vocab=vocab, progress=milestone_hook("seq", t))
        t_seq = time.perf_counter() - t
        t = time.perf_counter()
        bat = learn_merges_batched(
            docs, n, vocab=vocab, progress=milestone_hook("bat", t)
        )
        t_bat = time.perf_counter() - t
        assert seq == bat, f"batched != sequential at n_merges={n}"
        # batch-size profile: rounds = scout jobs; infer from timings
        print(
            f"n_merges={n}: sequential {t_seq:.1f}s "
            f"({t_seq / max(len(seq), 1):.3f}s/merge), "
            f"batched {t_bat:.1f}s ({t_bat / max(len(bat), 1):.3f}s/merge), "
            f"speedup x{t_seq / t_bat:.2f}, learned {len(seq)} merges, "
            f"EQUAL output"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
