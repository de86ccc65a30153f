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
  xxhash64(word, doc_id, i) — shingles (consecutive word k-grams)
  differ across copies, so near-dup rates stay realistic, while the
  WORD VOCABULARY is bit-identical, which is exactly what the
  "vocabulary-sized BPE rounds" claim needs held constant;
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

Fixture-validity caveat (learned from the gate, r11): the document
word-permutation is invisible to ORDER-INDEPENDENT fingerprints —
SimHash over unigram tokens assigns all 10 copies of a doc the same
fingerprint, so copy families become genuine 45-pair near-dup cliques
and any unigram-fingerprint query measures output growth (~x100), not
plan scaling. Use shingle-based queries (MinHash, word-3-gram Jaccard)
to trend that family; see SCALE_TREND_r11_sf1.txt.

Output: /root/repo/scale_sf1/<table>.parquet (gitignored — ~1 GiB).
Usage: python tools/make_sf1.py [n_copies]
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


def copies(df, n, remap):
    """Union n key-remapped copies; ``remap(df, i)`` returns copy i
    (copy 0 is the original)."""
    out = remap(df, 0)
    for i in range(1, n):
        out = out.unionByName(remap(df, i))
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("make-sf1", shuffle_partitions="32")
    spark.sparkContext.setLogLevel("FATAL")
    dst = pathlib.Path(DST)
    dst.mkdir(exist_ok=True)

    def read(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def write(df, t):
        df.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()} rows")

    # documents: per-copy word permutation, same vocabulary
    def doc_copy(df, i):
        if i == 0:
            return df
        permuted = F.expr(
            "array_join(transform(array_sort(transform("
            "  filter(split(text, '\\\\s+'), w -> w != ''),"
            f" w -> struct(xxhash64(w, doc_id, {i}) AS h, w AS w))),"
            " s -> s.w), ' ')"
        )
        return df.select(
            (F.col("doc_id") + F.lit(i * KEY_STRIDE)).alias("doc_id"),
            permuted.alias("text"),
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
