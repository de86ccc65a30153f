#!/usr/bin/env python
"""Regenerate PLANS.md: a physical-plan audit of the headline queries.

For each bench headline query (plus the newer pipeline operators) this
records the scale-relevant plan facts — shuffle count, parquet filter
pushdown, read-schema width, join strategies, codegen coverage — so a
reviewer can see the 100 TB story in the actual Catalyst output rather
than taking the docstrings' word for it.

Usage: python tools/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from in_stream_processing_course_spark.plans.registry import QUERIES
from in_stream_processing_course_spark.session import get_spark

SF = "/root/testdata/sf0.001"

# Iterative queries that EXECUTE during DataFrame construction
# (connected-components / pagerank rounds localCheckpoint per round, so
# the final explain shows ExistingRDD scans, not the real per-round
# plan): audited via docstrings + the sf0.1 spot-check table instead.
ITERATIVE_EXCLUDED = {
    "curation_end_to_end": "connected-components rounds (localCheckpoint)",
    "dedup_keep_best_quality": "connected-components rounds",
    "dedup_cluster_size_histogram": "connected-components rounds",
    "dedup_clusters": "connected-components rounds",
    "semantic_dedup_keep": "connected-components rounds",
    "curation_manifest": "connected-components rounds",
    "split_documents_cluster_safe": "connected-components rounds",
    "split_leakage_audit": "builds on split_documents_cluster_safe",
    "pagerank_customer_supplier": "5 pagerank rounds (localCheckpoint)",
    "embedding_kmeans_fit": "5 Lloyd's rounds (per-round driver collect)",
    "bpe_learned_merges": "20 merge rounds -> driver-held merge table",
    "semantic_dedup_kmeans": "connected-components rounds",
    "bpe_encoded_token_counts": "20 learn + 20 encode rounds (localCheckpoint)",
    "bpe_doc_token_counts": "learn + fertility-encode rounds (localCheckpoint)",
    "bpe_lang_fertility": "learn + fertility-encode rounds (localCheckpoint)",
    "bpe_token_coverage_curve": "learn + encode rounds (localCheckpoint)",
    "mixing_weights_token_budget": "learn + fertility-encode rounds (localCheckpoint)",
    "embedding_principal_direction": "8 power-iteration rounds (per-round driver collect)",
    "embedding_linear_probe_fit": "8 GD rounds -> driver-held weight vector (result is a 65-row local table)",
    "customer_pareto_curve_approx": "grid thresholds + one conditional-aggregate pass execute at construction; result is a 99-row local table",
}

_LEGACY_AUDITED = [
    "bot_stats_sliding",
    "bot_stats_two_level",
    "bot_classified_totals",
    "bot_verdicts",
    "sessionize_events",
    "hourly_event_counts",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume",
    "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_excess_shippers",
    "window_running_revenue",
    "dedup_events_exact",
    "dedup_minhash_candidates",
    "dedup_simhash_candidates",
    "knn_brute_force",
    "text_metrics",
    "asof_click_last_view",
    "range_join_session_events",
    "join_salted_priority_revenue",
    "sample_events_stratified",
    "text_tfidf",
    "text_chunks",
    "lateral_top_orders_per_customer",
    "events_rolling_7d",
    "events_hourly_gapfill",
    "events_value_outliers",
    "user_type_history",
    "attribution_daily_revenue",
    "events_hourly_interpolated",
    "text_inverted_index",
    "audience_overlap_matrix",
    "dedup_fuzzy_part_names",
    "dedup_incremental_new_docs",
    "dedup_minhash_capped",
    "knn_lsh_multiprobe",
    "dedup_repeated_paragraphs",
    "text_pii_scan",
    "mix_documents_weighted",
    "shard_documents_balanced",
    "dedup_minhash_containment",
    "dedup_shingle_novelty",
    "dedup_source_overlap",
    "events_value_robust_outliers",
    "user_value_ewma",
    "semantic_dedup_keep",
    "split_documents_tvt",
    "curation_manifest",
    "text_gopher_rules",
    "funnel_three_step",
    "decontaminate_bloom",
    "text_boilerplate_removed",
    "embedding_random_projection",
    "text_vocab_coverage",
    "quality_calibration",
    "events_ks_drift",
    "events_categorical_drift",
    "scd2_user_type",
    "incremental_daily_rollup",
    "view_click_interval_join",
    "merge_user_profiles",
    "split_leakage_audit",
    "text_type_token_stats",
    "data_quality_audit",
    "partition_health",
    "profile_change_feed",
    "temporal_join_events_dim",
]

# the audit covers EVERY registered query (VERDICT r3 item 5): the
# legacy hand-picked order first (stable diffs round-over-round), then
# every remaining registered name alphabetically, minus the documented
# iterative exclusions
AUDITED = [
    n for n in _LEGACY_AUDITED if n not in ITERATIVE_EXCLUDED
] + sorted(set(QUERIES) - set(_LEGACY_AUDITED) - set(ITERATIVE_EXCLUDED))


def physical(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _parse_tree(plan: str) -> list[tuple[int, int, str]]:
    """Parse the formatted-explain tree rendering into
    (node_id, depth, line_text) rows, in pre-order."""
    out: list[tuple[int, int, str]] = []
    for line in plan.splitlines():
        m = re.match(r"^([\s:+*-]*)([A-Za-z][\w .,=$#()\[\]'>-]*)\((\d+)\)\s*$", line)
        if not m:
            continue
        prefix, text, nid = m.group(1), m.group(2), int(m.group(3))
        out.append((nid, len(prefix) // 3, text.strip()))
    return out


def _subtree(tree: list[tuple[int, int, str]], idx: int) -> list[int]:
    """Node ids of the subtree rooted at tree[idx] (pre-order slice)."""
    depth = tree[idx][1]
    ids = [tree[idx][0]]
    for nid, d, _ in tree[idx + 1:]:
        if d <= depth:
            break
        ids.append(nid)
    return ids


def _children(tree: list[tuple[int, int, str]], idx: int) -> list[int]:
    """Indices (into tree) of the direct children of tree[idx]."""
    depth = tree[idx][1]
    kids = []
    for j in range(idx + 1, len(tree)):
        if tree[j][1] <= depth:
            break
        if tree[j][1] == depth + 1:
            kids.append(j)
    return kids


def _agg_keys(plan: str, nid: int) -> int | None:
    """Grouping-key count of the (nid) HashAggregate/ObjectHashAggregate
    detail section, or None if node nid is not an aggregate."""
    m = re.search(
        rf"\({nid}\) (?:\w*HashAggregate|SortAggregate)\w*\n(?:.*\n)*?Keys \[(\d+)\]",
        plan,
    )
    return int(m.group(1)) if m else None


def _side_bound(plan: str, tree, idx: int) -> str | None:
    """Bounded-cardinality proof for the subtree at tree[idx]:
    'scalar' if its output is a global aggregate (exactly 1 row,
    possibly exploded over a generated bounded sequence), 'agg' if it
    is an aggregate keyed on derived columns (distinct-of-enum-sized),
    None if it is data-sized."""
    ids = _subtree(tree, idx)
    # walk down through pass-through nodes to the first "real" operator
    for j in range(idx, idx + len(ids)):
        nid, _, text = tree[j]
        op = text.split()[0]
        if op in ("Project", "Filter", "BroadcastExchange", "Exchange",
                  "Sort", "WholeStageCodegen", "InputAdapter",
                  "ColumnarToRow", "AQEShuffleRead", "Coalesce"):
            continue
        keys = _agg_keys(plan, nid)
        if keys == 0:
            return "scalar"
        if keys is not None:
            return "agg"
        if op == "Generate":
            # explode over a generated sequence: bounded iff what it
            # explodes FROM is bounded — keep walking
            continue
        if op == "BroadcastNestedLoopJoin":
            # a cross of two bounded sides is bounded iff both are
            kids = _children(tree, j)
            if len(kids) == 2:
                a = _side_bound(plan, tree, kids[0])
                b = _side_bound(plan, tree, kids[1])
                if a and b:
                    return "agg"
            return None
        return None
    return None


def classify_nested_loops(plan: str) -> str:
    """'no' when the plan has no nested-loop join; otherwise a
    per-join bounded-side proof ('scalar' = 1-row global-aggregate
    broadcast, 'agg' = aggregate-keyed bounded side, 'YES' = a
    data-sized side — a genuine scale risk)."""
    tree = _parse_tree(plan)
    labels: list[str] = []
    for i, (nid, _, text) in enumerate(tree):
        op = text.split()[0]
        if op not in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            continue
        kids = _children(tree, i)
        sides = [_side_bound(plan, tree, k) for k in kids]
        if "BuildRight" in text and len(sides) == 2:
            build = sides[1] or sides[0]
        elif "BuildLeft" in text and len(sides) == 2:
            build = sides[0] or sides[1]
        else:
            build = next((s for s in sides if s), None)
        labels.append(build if build else "YES")
    if not labels:
        return "no"
    return ",".join(labels)


def audit(plan: str) -> dict[str, object]:
    # count detail-section nodes only ("(N) Scan parquet"), not the
    # tree rendering, which would double-count every operator
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    shuffles = plan.count("hashpartitioning(")
    fanout = plan.count("Arguments: RoundRobinPartitioning")
    pushed = len(
        [
            m
            for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
            if m.strip()
        ]
    )
    read_widths = [
        len(m.split(","))
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
    smj = len(re.findall(r"\(\d+\) SortMergeJoin", plan))
    shj = len(re.findall(r"\(\d+\) ShuffledHashJoin", plan))
    wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
    cart = classify_nested_loops(plan)
    return {
        "scans": scans,
        "shuffles": shuffles,
        "fanout": fanout,
        "scans_with_pushdown": pushed,
        "read_widths": read_widths,
        "joins (bhj/smj/shj)": f"{bhj}/{smj}/{shj}",
        "codegen_spans": wsc,
        "nested_loop": cart,
    }


def main() -> None:
    spark = get_spark("plan-audit", shuffle_partitions="8")
    spark.sparkContext.setLogLevel("FATAL")
    # AQE's pre-execution plan carries no codegen annotations; disable
    # it for the audit so WholeStageCodegen spans are visible. (The
    # engine itself always runs with AQE on — session.py.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    lines = [
        "# PLANS — physical-plan audit of every registered query",
        "",
        "Generated by `tools/dump_plans.py` from `.explain('formatted')` at"
        f" `{SF}` — {len(AUDITED)} of {len(QUERIES)} registered queries"
        f" ({len(ITERATIVE_EXCLUDED)} iterative queries excluded, listed at"
        " the end). Scale-relevant facts per query: parquet scan count,"
        " hash-shuffle count (`Exchange hashpartitioning`), single-split"
        " fan-out repartitions, scans with non-empty `PushedFilters`,"
        " per-scan `ReadSchema` column counts (pruning), join strategies"
        " (broadcast/sort-merge/shuffled-hash), `WholeStageCodegen` span"
        " count, and whether any nested-loop join appears (it never"
        " should, except the deliberate 1-row scalar broadcasts).",
        "",
        "| query | scans | shuffles | fan-out | pushdown scans |"
        " read widths | joins bhj/smj/shj | codegen spans | nested loop |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name in AUDITED:
        a = audit(physical(QUERIES[name](spark, SF)))
        lines.append(
            f"| {name} | {a['scans']} | {a['shuffles']} | {a['fanout']} |"
            f" {a['scans_with_pushdown']} | {a['read_widths']} |"
            f" {a['joins (bhj/smj/shj)']} | {a['codegen_spans']} |"
            f" {a['nested_loop']} |"
        )
    lines += [
        "",
        "Notes:",
        "- `shuffles` counts `Exchange hashpartitioning` nodes in the",
        "  pre-AQE plan; AQE may further coalesce partitions at runtime.",
        "- `fan-out` is the deliberate round-robin repartition of",
        "  single-split scans (driver testdata is one parquet file; see",
        "  README Performance) — it disappears at real scale where the",
        "  scan has enough splits.",
        "- the nested-loop column carries a PER-JOIN bounded-side proof",
        "  (r14, VERDICT r13 #7), derived mechanically from the plan by",
        "  tools/dump_plans.py::classify_nested_loops: `scalar` = the",
        "  broadcast side is a GLOBAL aggregate (exactly one row — the",
        "  q15-style max join, tfidf's corpus-size N, the lm family's",
        "  vocabulary-size smoothing denominator, sketch-union /",
        "  regression-moment / quantile-array scalars), `agg` = the",
        "  broadcast side is an aggregate keyed on a derived",
        "  low-cardinality column (the event-type enum in the gapfill",
        "  hour-spine cross; a cross of two bounded sides classifies as",
        "  the weaker bound of the two), `YES` = a data-sized side — a",
        "  genuine scale risk. The only YES rows are knn_brute_force",
        "  (inherently cartesian by definition; knn_lsh_multiprobe /",
        "  knn_ivf_auto are the registered scale paths) and",
        "  retrieval_mmr_diversified's bounded depth-50 candidate cross",
        "  (LIMIT-bounded, not data-sized — the classifier cannot see",
        "  limits, documented here).",
        "",
        "## Excluded from the table (iterative: explain shows only the",
        "final round's lineage-truncated plan)",
        "",
        "| query | why |",
        "|---|---|",
    ] + [
        f"| {name} | {why} |" for name, why in sorted(ITERATIVE_EXCLUDED.items())
    ] + [
        "",
        "Their per-round plan contract is pinned by tests instead",
        "(`test_near_dup_queries_have_no_cross_product`, the CC operator's",
        "one-shuffle-per-round docstring + unit tests).",
        "",
        "## 100 TB deployment defaults: exact vs `_approx` twins (r9)",
        "",
        "Where both forms exist, the deployment default depends on how the",
        "export is CONSUMED:",
        "- curve/chart/health-metric consumers call the `_approx` twin —",
        "  `customer_pareto_curve_approx` (99 grid rows, one mergeable",
        "  percentile sketch + one conditional-aggregate pass, no rank) and",
        "  `event_value_percentiles_approx` (KLL-style mergeable summary,",
        "  one map-side accumulator);",
        "- per-row exports (every customer with its rank / every event",
        "  type's exact rank-selected percentile) call the exact forms,",
        "  which since r9 assemble their global ranks as two-phase prefix",
        "  ranks (`operators/ranks.py`) — per-range local windows +",
        "  broadcast offsets from a config-bounded rollup — so the exact",
        "  path no longer single-tasks a corpus-growing rollup either.",
        "The `_approx` twins are rows-only by design (sketch internals are",
        "engine-specific); their exact twins bound them, and",
        "`tests/test_round9_ops.py` pins approx-vs-exact agreement.",
        "",
        "### r10: the `_dd` / theta twins are oracle-replayable sketches",
        "",
        "`customer_pareto_curve_dd` and `event_value_percentiles_dd` serve the",
        "same chart/health-metric consumers from the DD-style log-bucket",
        "histogram (`operators/sketches.dd_histogram`), and",
        "`events_theta_distinct_users` serves distinct-user accounting from",
        "the theta hash sample — in all three the sketch rule is portable",
        "arithmetic (ln/ceil against a log-gamma literal; md5-prefix",
        "threshold), so the DuckDB oracles replay the sketches END-TO-END",
        "(build, cumulative walk / union, estimate arithmetic), unlike the",
        "KLL/HLL `_approx` twins. Guarantees pinned in",
        "`tests/test_round10_ops.py`, `tests/test_sketches.py`,",
        "`tests/test_streaming_theta.py`. Plan shapes: all post-rollup work",
        "runs on range-bounded histograms / p-sized samples (the",
        "partition-less cumulative window and 99-point grid cross are",
        "bucket-bounded — adjudicated in tests/test_plans.py). Streaming",
        "halves: `streaming/percentiles.py` and `streaming/distinct_sketch.py`",
        "maintain the same artifacts continuously (the cm_sketch contract).",
        "A 100 TB deployment has three tiers: exact two-phase rank (per-row",
        "exports), batch `_dd`/theta sketch (oracle-auditable curves and",
        "counts), maintained streaming sketch (continuous); `_approx` stays",
        "for consumers wanting Spark's built-in KLL/HLL error profiles.",
        "",
        "## Heavy-query spot check at sf0.1 (local[32], noop sink, single pass)",
        "",
        "The non-headline composition/iterative queries, which never appear in",
        "bench.py, timed once at 10x the correctness SF to confirm none hides",
        "super-linear behavior (2026-08-14, post oracle-CTE rewrite; IVF/BPE",
        "rows re-measured 2026-08-16 after the interpreted-eval fixes —",
        "the full-registry smoke dropped 383s -> 307s):",
        "",
        "| query | wall | dominated by |",
        "|---|---|---|",
        "| dedup_fuzzy_part_names | 6.2s | brand-blocked pair join probing the distinct-name-pair distance table (r9: the banded DP runs once per distinct name pair — vocabulary-sized — instead of once per part pair; 25.3s unbounded DP -> 15.1s banded-per-pair -> 6.2s) |",
        "| embedding_hard_negatives_ivf / knn_ivf | 15.4s cold / 2.4-3.0s with the index cached (was 35.6 / 26.8) | the r9 interpreted-fold diagnosis led to three hash-preserving fixes: (1) `l2_normalize_col` hoists the norm out of the per-element lambda (the interpreted HOF evaluator re-ran the scalar norm fold once PER ELEMENT — 128 folds/row at dim 64 — and filter pushdown inlined that tree into the join-key null check); (2) `assign_to_centroids` reads its k-fold distance array once through an array_sort struct head instead of three aliased references; (3) `distances_col` builds its k x dim literal tree as ONE F.expr string instead of ~1k py4j round-trips per plan. Residual cost is the Lloyd fit's driver-paced rounds (~2s/iter, one-time, cached by corpus key) plus genuinely-interpreted fold arithmetic, linear in corpus x k; a deploy-time run uses the pyspark.ml `ivf_topk` or plain-sum folds and keeps the Lloyd path for auditability |",
        "| bpe_doc_token_counts / bpe_encoded_token_counts | 15.2s / 1.6s (was 17.4 / 8.6) | iterative tokenizer training (session-cached) + run-batched encode: r9 replaced the chunk-of-4 chained apply_merge_col projections — interpreted cost EXPONENTIAL in chain depth, a measured hang on realistic word lengths — with ONE apply_merges_col fold pass per pairwise-disjoint run (provably equal, pinned in tests/test_bpe.py) |",
        "| curation_manifest | 11.6s | blocked cosine pair join — blocks are POLICY-SIZED (label x policy_cell_assignment seed-centroid cells, k = max(sqrt n, n/8192) from count(*), plans/pipeline_queries.py:1335 since r11) so within-block pair work stays ~linear in the corpus; norms precomputed per row |",
        "| dedup_winnowed_candidates | 5.2s | per-doc gram hashing (md5+conv per k-gram; window minima already reduced to two zip_with passes — 25.7s before) |",
        "| semantic_dedup_keep | 8.7s | same pair join |",
        "| dedup_clusters | 1.7s | per-round fixed cost of iterative CC (count action + localCheckpoint per round), not data volume |",
        "| curation_end_to_end | 6.9s | quality filter + LSH + CC composition |",
        "| pagerank_customer_supplier | 6.1s | 5 fixed iterations x (join + groupBy-sum + localCheckpoint) |",
        "| everything else tested | <= 2.6s | scan-shaped |",
        "",
        "sf0.01 -> sf0.1 ratios are ~1-3x on 10x data for all of the above —",
        "fixed per-round/scheduling overhead still dominates at this size; the",
        "data-proportional part is sublinear in wall because cores are idle at",
        "sf0.01.",
        "",
        "## sf0.1 -> sf1 trend (r10 measured, r11 repaired + gated)",
        "",
        "`tools/make_sf1.py` builds a 10x workload-preserving fixture (same",
        "vocabulary, realistic near-dup rates, dimension tables held fixed).",
        "r10 (`SCALE_TREND_r10_sf1.txt`) measured the ten most expensive",
        "queries at both SFs and caught two within-block quadratics: FIXED",
        "block counts (dedup_embedding_cosine on label blocks,",
        "semantic_dedup_kmeans on k=8 seed clusters) blew up to x19-21 on",
        "x10 data. r11 (`SCALE_TREND_r11_sf1.txt`) wires the",
        "`n_lists_for_corpus` policy into the REGISTERED queries — block",
        "keys are policy-sized seed-centroid cells, k = max(sqrt n, n/8192)",
        "from count(*), and every affected oracle re-derives k in SQL so",
        "the driver hash-checks the policy itself. Measured result: the",
        "x19-21 rows drop to x3.0-4.3 (sf1 walls 139-142s -> 14-15s), the",
        "watch-listed composites (semantic_dedup_keep, curation_manifest)",
        "to x2.8-3.5, and sf0.1 walls also FELL (finer blocks pay at test",
        "SF too). The trend is now a CI gate: `tools/scale_smoke.py --sf1`",
        "fails loud if any ratio exceeds its per-query budget",
        "(tools/scale_budgets.json). Honest non-quadratic shapes are",
        "unchanged: BPE x0.6-1.0 (vocabulary-sized), two-phase ranks ~x1.5,",
        "iterative joins ~x2, IVF ~x3.2, bounded-sample probe fit x6.3-6.7",
        "(honest-linear under its 20k cap).",
        "",
        "r12 extends the gate to the FULL registry",
        "(`tools/scale_smoke.py --sf1-full`: coarse x8 default budget for",
        "unlisted queries, enforced when the sf1 wall >= 3s, per-query",
        "overrides for the adjudicated super-linear shapes) and makes the",
        "fixture honest for order-invariant fingerprints (tools/make_sf1.py",
        "now substitutes ~30% of token positions per copy from within the",
        "same doc — corpus vocabulary unchanged, token multisets differ, so",
        "SimHash copy families stop being identical-fingerprint cliques;",
        "the family's gate entry is the new dedup_simhash_capped, because",
        "the tuning measurement showed the UNCAPPED join's output is",
        "inherently ~quadratic on a correlated corpus — 700k pairs from",
        "5,000 base docs — which a bucket cap, not a fixture, fixes).",
        "The IVF policy build also gained the two-level coarse-quantizer",
        "form in r12 (route rows through isqrt(k) anchors, score only the",
        "matching group's fine centroids — n*~2*sqrt(k)*d instead of",
        "n*k*d, exponent ~1.25 instead of 1.5 under k=sqrt(n); the oracle",
        "replays the rule bit-for-bit).",
        "",
        "r13 promotes the two-level build to the registered `knn_ivf_auto`",
        "path (VERDICT r12 #1: the exact-assign build trended x15.89 under",
        "a x16.00 budget — margin thinner than the gate's own session",
        "noise; the coarse build is the form a 100x deployment builds",
        "with, budget x5). The exact n^1.5-assignment build stays",
        "registered as the explicitly-named `knn_ivf_exact_build` twin",
        "with its adjudicated build-dominated budget restored to x18",
        "(ADVICE r12: real margin above the worst committed measurement).",
        "r13 also closes the gate's sub-3s blind spot (VERDICT r12 #2):",
        "enforcement now starts at sf1 wall >= 0.5s, with budgets widened",
        "to >= x12 in the [0.5s, 3s) small-wall band where fixed per-query",
        "overhead dominates — a quadratic in a currently-tiny query now",
        "fails the gate a scale decade before it can hide minutes of",
        "work, while committed calibrated bars still govern walls >= 3s.",
        "",
    ]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(AUDITED)} queries)")


if __name__ == "__main__":
    main()
