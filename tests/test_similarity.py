"""ANN quality tests: the approximate variants (sign-LSH, IVF) are
validated by RECALL against the exact brute-force baseline — the
correctness anchor the oracle can't provide for learned indexes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from in_stream_processing_course_spark.sources.batch import load_table


def test_n_lists_policy_scales_with_corpus():
    """VERDICT r9 next-round #2: the cell-count policy, pinned on
    synthetic sizes (the registered queries keep n_lists=16 — hashes
    must not change — so the policy is tested here, not by
    re-registering)."""
    from in_stream_processing_course_spark.operators.similarity import (
        DEFAULT_MAX_ROWS_PER_CELL,
        n_lists_for_corpus,
    )

    # tiny corpora: the floor wins (cells must still mean "near")
    assert n_lists_for_corpus(10) == 10  # never more cells than rows
    assert n_lists_for_corpus(100) == 16
    # test-SF territory: √n regime
    assert n_lists_for_corpus(6_000) == 77
    assert n_lists_for_corpus(60_000) == 244
    # past max_rows_per_cell² the quadratic-block cap dominates:
    # rows-per-cell stays bounded, so same-cell self-join work is
    # linear in the corpus, not quadratic
    for n in (10**8, 10**9, 10**10):
        lists = n_lists_for_corpus(n)
        assert n / lists <= DEFAULT_MAX_ROWS_PER_CELL
        assert lists >= n // DEFAULT_MAX_ROWS_PER_CELL
    # monotone in corpus size (no cliff where a bigger corpus gets a
    # smaller index)
    sizes = [10, 10**2, 10**4, 10**6, 10**8, 10**10]
    got = [n_lists_for_corpus(n) for n in sizes]
    assert got == sorted(got)
    # custom cap is honored
    assert n_lists_for_corpus(10**6, max_rows_per_cell=100) == 10_000
    with pytest.raises(ValueError):
        n_lists_for_corpus(0)
    with pytest.raises(ValueError):
        n_lists_for_corpus(10, max_rows_per_cell=0)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, 5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, probes, 5, n_lists=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # n_probe=4/16 on 64-dim random-ish vectors: expect decent recall,
    # and determinism (seeded k-means) makes this a stable bound
    assert recall >= 0.5, f"IVF recall {recall:.2f} below bound"


def test_ivf_lloyd_recall_vs_brute_force(spark, sf_dir):
    """The Lloyd-indexed IVF (knn_ivf's r9 oracle-replayable path) must
    keep the same recall bound as the pyspark.ml variant — the hash
    check proves determinism, this proves the index is a USEFUL one."""
    from in_stream_processing_course_spark.operators.similarity import (
        ivf_topk_lloyd,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, 5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk_lloyd(
            emb, probes, 5, n_lists=16, n_iters=5, n_probe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"Lloyd IVF recall {recall:.2f} below bound"


def test_hard_negatives_ivf_recall_vs_exact(spark, sf_dir):
    """The IVF-bucketed hard-negative miner (the registered 100 TB
    scale-swap) must recover a useful share of the exact miner's
    banded negatives — misses are exactly the not-probed-cell kind,
    the knn_ivf trade."""
    from in_stream_processing_course_spark.operators.similarity import (
        hard_negatives_topk,
        hard_negatives_topk_ivf,
    )
    from in_stream_processing_course_spark.plans.similarity_queries import (
        _HN_HI,
        _HN_LO,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in hard_negatives_topk(
            emb, probes, 5, lo=_HN_LO, hi=_HN_HI
        ).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in hard_negatives_topk_ivf(
            emb, probes, 5, lo=_HN_LO, hi=_HN_HI,
            n_lists=16, n_iters=5, n_probe=4,
        ).collect()
    }
    assert exact, "exact miner found no banded negatives at this SF"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF hard-negative recall {recall:.2f} below bound"


def test_ivf_cache_is_bounded_lru(spark, sf_dir):
    """Repeated knn_ivf over many distinct corpora must hold at most
    _IVF_CACHE_MAX fitted models (VERDICT r2 item 4), with LRU order —
    the most recently used keys survive."""
    from in_stream_processing_course_spark.operators import similarity as sim

    sim._IVF_INDEX_CACHE.clear()
    emb = load_table(spark, sf_dir, "embeddings").limit(64).cache()
    probes = emb.limit(2)
    n_corpora = sim._IVF_CACHE_MAX + 3
    for i in range(n_corpora):
        ivf_topk(emb, probes, 2, n_lists=4, cache_key=f"corpus-{i}").count()
        assert len(sim._IVF_INDEX_CACHE) <= sim._IVF_CACHE_MAX
    # the oldest keys were evicted, the newest survive
    surviving = set(sim._IVF_INDEX_CACHE)
    expect = {
        f"corpus-{i}:4:42:20000"
        for i in range(n_corpora - sim._IVF_CACHE_MAX, n_corpora)
    }
    assert surviving == expect
    # a cache hit refreshes recency: touch the oldest survivor, add one
    # more corpus, and the touched key must still be present
    oldest = f"corpus-{n_corpora - sim._IVF_CACHE_MAX}"
    ivf_topk(emb, probes, 2, n_lists=4, cache_key=oldest).count()
    ivf_topk(emb, probes, 2, n_lists=4, cache_key="corpus-extra").count()
    assert f"{oldest}:4:42:20000" in sim._IVF_INDEX_CACHE
    emb.unpersist()
    sim._IVF_INDEX_CACHE.clear()


def test_ivf_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 4)
    a = sorted(tuple(r) for r in ivf_topk(emb, probes, 3).collect())
    b = sorted(tuple(r) for r in ivf_topk(emb, probes, 3).collect())
    assert a == b


def test_multiprobe_recall_dominates_single_bucket(spark, sf_dir):
    """Multi-probe searches a strict superset of buckets, so per-query
    recall vs brute force can only improve — and candidate growth is
    bounded by (n_bits + 1) x the probe side only."""
    from in_stream_processing_course_spark.operators.similarity import (
        bucketed_topk,
        multiprobe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, 5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in bucketed_topk(emb, probes, 5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in multiprobe_topk(emb, probes, 5).collect()
    }
    assert len(exact & multi) >= len(exact & single)


def test_principal_direction_maximizes_variance(spark, sf_dir):
    """The fitted per-label direction must (a) be deterministic across
    runs, (b) explain a sane variance share, and (c) beat 10 random
    unit directions at capturing variance — the property that makes it
    the principal component."""
    import numpy as np

    from in_stream_processing_course_spark.operators.similarity import (
        label_principal_directions,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out1 = {
        r["label"]: (r["explained_ratio"], r["top_dim"], r["top_weight"])
        for r in label_principal_directions(emb).collect()
    }
    out2 = {
        r["label"]: (r["explained_ratio"], r["top_dim"], r["top_weight"])
        for r in label_principal_directions(emb).collect()
    }
    assert out1 == out2, "per-group fit must be deterministic"
    assert len(out1) >= 2
    for label, (ratio, top_dim, top_weight) in out1.items():
        assert 0.0 < ratio <= 1.0 + 1e-9
        assert top_weight > 0  # orientation convention
    # variance comparison on one label, locally
    label0 = sorted(out1)[0]
    rows = emb.where(F.col("label") == label0).collect()
    X = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    Xc = X - X.mean(axis=0)
    total = (Xc ** 2).sum() / len(X)
    fitted_var = out1[label0][0] * total
    rng = np.random.default_rng(3)
    for _ in range(10):
        v = rng.normal(size=X.shape[1])
        v /= np.linalg.norm(v)
        rand_var = float(((Xc @ v) ** 2).sum()) / len(X)
        assert fitted_var >= rand_var - 1e-9


def test_persisted_ivf_index_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    """build_ivf_index / ivf_topk_on_index: the offline-build +
    online-probe split must return exactly what the inline ivf_topk
    computes with the same parameters, and the probe-side corpus scan
    must be directory-pruned to the probed cells (PartitionFilters on
    the hive layout, not a post-scan filter)."""
    from in_stream_processing_course_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_on_index,
    )
    from in_stream_processing_course_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.orderBy("vec_id").limit(3)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_lists=8, seed=7)

    on_index = ivf_topk_on_index(spark, probes, path, k=4, n_probe=2)
    inline = ivf_topk(emb, probes, k=4, n_lists=8, n_probe=2, seed=7)
    got = {tuple(r) for r in on_index.collect()}
    want = {tuple(r) for r in inline.collect()}
    assert got == want and got

    # layout: hive cell=<k> directories exist
    import os

    cells = [d for d in os.listdir(f"{path}/corpus") if d.startswith("cell=")]
    assert len(cells) == 8

    # plan: the probed scan carries a PartitionFilters entry on cell
    jvm = on_index.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = on_index._jdf.queryExecution().explainString(mode)
    import re

    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any(re.search(r"cell#\d+ IN \(", l) for l in pf), pf


def test_n_lists_auto_resolves_through_policy(spark, sf_dir):
    """n_lists="auto" (r10) sizes the Lloyd index from the corpus via
    the policy and produces the same index as passing the resolved
    integer explicitly (shared cache key included)."""
    from in_stream_processing_course_spark.operators.similarity import (
        lloyd_index_centroids,
        n_lists_for_corpus,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    expect_k = n_lists_for_corpus(emb.count())
    auto = lloyd_index_centroids(emb, n_lists="auto", n_iters=1)
    explicit = lloyd_index_centroids(emb, n_lists=expect_k, n_iters=1)
    assert len(auto) == expect_k
    assert auto == explicit


def test_ivf_coarse_recall_vs_brute_force(spark, sf_dir):
    """The two-level (coarse-quantizer) build must stay a USEFUL
    index: cell boundaries move slightly vs exact assignment, but
    n_probe recovers recall — same bound as the exact-assign twins."""
    from in_stream_processing_course_spark.operators.similarity import (
        ivf_topk_lloyd,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, 5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk_lloyd(
            emb, probes, 5, n_lists="auto", n_iters=5, n_probe=4,
            two_level=True,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"coarse IVF recall {recall:.2f} below bound"
