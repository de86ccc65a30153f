#!/usr/bin/env python
"""Build the ~sf1-equivalent upsampled fixture (VERDICT r9 next-round
#3): 10x the sf0.1 tables the ten most expensive smoke queries touch,
so the scale claims ("vocabulary-sized, not corpus-sized", "blocked,
never all-pairs", "bounded fit sample") get a measured sf0.1 -> sf1
trend line instead of a one-order-below extrapolation.

Upsampling is deterministic and WORKLOAD-PRESERVING, not naive
replication (10 identical copies would turn every dedup/similarity
block into an artificial 10x-multiplicity duplicate cluster and
measure pair-explosion pathology instead of scale):

- documents: copy i permutes each doc's word order by
  xxhash64(word, doc_id, i) AND (r12) substitutes a deterministic
  ~MUTATE_PCT% of token positions with another token drawn from the
  SAME document — shingles (consecutive word k-grams) differ across
  copies, the token MULTISET now also differs (so order-invariant
  unigram fingerprints like SimHash separate the copies instead of
  collapsing them into identical-fingerprint cliques — the r11 gate
  caveat), while the corpus WORD VOCABULARY stays bit-identical
  (copy 0 is untouched and every substitute is a word of the same
  doc), which is exactly what the "vocabulary-sized BPE rounds"
  claim needs held constant;
- embeddings: copy i jitters each dim by 0.05*sin(vec_id*31+d*7+i*131)
  — geometry (cluster structure, norms ~) preserved, exact duplicates
  avoided; labels carried;
- orders/customer/lineitem: key-remapped unions (custkey/orderkey
  + i*10^7) — the standard fact-table scale-up; supplier/part/nation
  stay dimension-sized (realistic: dimensions don't scale with facts);
- events (r11): key-remapped user/event copies — 10x rows AND users,
  timestamps unchanged (per-bucket population grows, like a busier
  deployment). Before r11 events passed through unchanged, which made
  every events-family trend row a vacuous x1 — the gate exposed it;
- region/nation/part/supplier copy through unchanged.

Fixture-validity history: before r12 the document upsample was
permutation-ONLY, which is invisible to ORDER-INDEPENDENT
fingerprints — SimHash over unigram tokens assigned all 10 copies of
a doc the same fingerprint, copy families became identical-
fingerprint cliques stacking into the same LSH buckets. The r12
token substitution spreads copies across buckets (measured on a
2k-doc sample: same-family band collisions 12,000/12,000 at pct=0 →
5,144 at pct=30). What mutation does NOT fix — measured while tuning
it — is that the UNCAPPED simhash candidate join's output is
inherently ~quadratic on this corpus regardless of copies: synthetic
docs share vocabulary, fingerprint bits correlate, single 12-bit
band values concentrate percent-scale fractions of the corpus
(700k candidate pairs from 5,000 BASE docs at sf0.1). So the gate
entry for the family is ``dedup_simhash_capped`` (hot buckets
dropped before the self-join, output ~linear — the deployment form,
same guard as dedup_minhash_capped); the uncapped twin stays
registered for correctness parity with this adjudication where the
budget would go.

Output: /root/repo/scale_sf1/<table>.parquet (gitignored — ~1 GiB).
Usage: python tools/make_sf1.py [n_copies] [mutate_pct]
(mutate_pct default MUTATE_PCT; 0 reproduces the pre-r12
permutation-only fixture for comparison runs)
"""

from __future__ import annotations

import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from in_stream_processing_course_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scale_sf1"
KEY_STRIDE = 10**7
# share of token positions substituted per copy (r12) — tuned
# empirically (tools/make_sf1.py docstring): high enough that copy
# fingerprints split across the 48-bit/12-bit-band SimHash, low
# enough that each copy is still a recognizable near-dup workload
MUTATE_PCT = 30


def copies(df, n, remap):
    """Union n key-remapped copies; ``remap(df, i)`` returns copy i
    (copy 0 is the original)."""
    out = remap(df, 0)
    for i in range(1, n):
        out = out.unionByName(remap(df, i))
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mutate_pct = int(sys.argv[2]) if len(sys.argv) > 2 else MUTATE_PCT
    spark = get_spark("make-sf1", shuffle_partitions="32")
    spark.sparkContext.setLogLevel("FATAL")
    dst = pathlib.Path(DST)
    dst.mkdir(exist_ok=True)

    def read(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def write(df, t):
        df.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()} rows")

    # documents: per-copy word permutation + low-rate within-doc token
    # substitution (r12) — same corpus vocabulary, different token
    # multiset per copy (see module docstring)
    def doc_copy(df, i):
        if i == 0:
            return df
        permuted_words = F.expr(
            "transform(array_sort(transform("
            "  filter(split(text, '\\\\s+'), w -> w != ''),"
            f" w -> struct(xxhash64(w, doc_id, {i}) AS h, w AS w))),"
            " s -> s.w)"
        )
        staged = df.withColumn("_w", permuted_words)
        if mutate_pct > 0:
            # position j keeps its word unless its deterministic coin
            # lands under mutate_pct, in which case it takes the word
            # at a hashed OTHER position of the same (permuted) doc —
            # multiset changes, per-doc vocabulary subset unchanged
            staged = staged.withColumn(
                "_w",
                F.expr(
                    "transform(_w, (w, j) -> CASE WHEN"
                    f" pmod(xxhash64('mut', w, doc_id, {i}, j), 100)"
                    f" < {mutate_pct}"
                    " THEN element_at(_w, CAST(pmod(xxhash64("
                    f"'sub', doc_id, {i}, j), size(_w)) + 1 AS INT))"
                    " ELSE w END)"
                ),
            )
        return staged.select(
            (F.col("doc_id") + F.lit(i * KEY_STRIDE)).alias("doc_id"),
            F.array_join("_w", " ").alias("text"),
            "lang",
            "source",
        ).select(
            "doc_id", "text", "lang", "source",
            F.length("text").cast("long").alias("n_chars"),
        )

    write(copies(read("documents"), n, doc_copy), "documents")

    # embeddings: per-copy deterministic jitter, labels carried
    def emb_copy(df, i):
        if i == 0:
            return df
        jittered = F.expr(
            "transform(embedding, (x, d) -> CAST(x + 0.05 *"
            f" sin(vec_id * 31 + d * 7 + {i} * 131) AS FLOAT))"
        )
        return df.select(
            (F.col("vec_id") + F.lit(i * KEY_STRIDE)).alias("vec_id"),
            jittered.alias("embedding"),
            "label",
        )

    write(copies(read("embeddings"), n, emb_copy), "embeddings")

    # fact tables: key-remapped unions
    def cust_copy(df, i):
        return df.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * KEY_STRIDE)
        )

    def orders_copy(df, i):
        return df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * KEY_STRIDE)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * KEY_STRIDE))

    def li_copy(df, i):
        return df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * KEY_STRIDE)
        )

    write(copies(read("customer"), n, cust_copy), "customer")
    write(copies(read("orders"), n, orders_copy), "orders")
    write(copies(read("lineitem"), n, li_copy), "lineitem")

    # events: key-remapped user/event copies (r11 — events passed
    # through unchanged before, so every events-family query measured
    # x1.0 "scaling" at sf1: vacuous. Remapping user_id keeps per-user
    # session/window structure realistic while the user population and
    # row count grow 10x — window buckets widen, sessionize islands
    # multiply, SCD islands multiply; timestamps stay put so bucket
    # CARDINALITY is constant and per-bucket population grows, the
    # usual shape of a busier deployment.)
    def ev_copy(df, i):
        return df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * KEY_STRIDE)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * KEY_STRIDE))

    write(copies(read("events"), n, ev_copy), "events")

    # pass-through tables (dimensions): copy the files
    for t in ("region", "nation", "part", "supplier"):
        target = dst / f"{t}.parquet"
        if target.is_dir():
            shutil.rmtree(target)
        elif target.exists():
            target.unlink()
        shutil.copy(f"{SRC}/{t}.parquet", target)
        print(f"{t}: copied through")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
