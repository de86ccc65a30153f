#!/usr/bin/env python
"""Measure the IVF cell-count policy fixing the fixed-block-count
quadratic (VERDICT r9 next-round #2 + #3 combined): the sf0.1 -> sf1
smoke showed the two within-block-quadratic queries
(semantic_dedup_kmeans, dedup_embedding_cosine) scaling ~x20 on x10
data — exactly the pathology of a block count that does not grow with
the corpus. This times the same cosine-pair candidate generation under
(a) the registered FIXED blocking and (b) policy-sized k-means blocks
(k = n_lists_for_corpus(n)), at both SFs, with pair counts so the
recall trade-off is visible (subdividing blocks can only LOSE
cross-block pairs — the SemDeDup knob, not a free lunch).

Usage: python tools/policy_scale_demo.py [sf_dirs...]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from in_stream_processing_course_spark.operators.clustering import (
    assign_to_centroids,
    seed_centroids,
)
from in_stream_processing_course_spark.operators.dedup import (
    embedding_cosine_pairs,
)
from in_stream_processing_course_spark.operators.similarity import (
    n_lists_for_corpus,
)
from in_stream_processing_course_spark.session import get_spark
from in_stream_processing_course_spark.sources.batch import load_table

FIXED_K = 8  # plans/clustering_queries._K, the registered constant
THRESHOLD = 0.3


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/scale_sf1"]
    spark = get_spark("policy-scale-demo", shuffle_partitions="32")
    spark.sparkContext.setLogLevel("FATAL")
    for sf_dir in dirs:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        for mode, k in (("fixed", FIXED_K), ("policy", n_lists_for_corpus(n))):
            t = time.perf_counter()
            centroids = seed_centroids(emb, k)
            assigned = assign_to_centroids(
                emb, centroids, dist_col=None
            )
            pairs = embedding_cosine_pairs(
                assigned, "vec_id", "embedding", "cluster", THRESHOLD
            )
            n_pairs = pairs.count()
            wall = time.perf_counter() - t
            print(
                f"{sf_dir} n={n} {mode}(k={k}): {wall:.1f}s, "
                f"{n_pairs} near-dup pairs",
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
