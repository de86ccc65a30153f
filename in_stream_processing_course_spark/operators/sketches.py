"""Frequent-items (heavy-hitters) via Misra-Gries summaries — the
candidate-generation path that finds every key with frequency > n/k
WITHOUT shuffling the full key space.

Shape (two passes over the data, O(k) driver-side state):

1. ``mapInPandas`` builds one Misra-Gries(k) summary per input
   partition (vectorized: per-Arrow-batch ``value_counts`` merged into
   the counter dict, then batched decrements — O(distinct-per-batch)
   Python ops, not O(rows)).
2. The per-partition summaries (≤ k-1 rows each) are merged with the
   mergeable-summaries rule [Agarwal et al., PODS'12]: sum estimates
   per key, subtract the k-th largest combined estimate, keep
   positives. The result is ≤ k-1 global candidates with undercount
   ≤ n/k — so every key with true count > n/k survives. This is a
   shuffle of ≤ partitions·k rows, not of the corpus.
3. Exact counts for the candidates only (broadcast semi-join — the
   candidate set is O(k) regardless of partition count), filtered to
   the true threshold ``count·k > n``.

The output is therefore EXACTLY the set of keys with count > n/k with
their exact counts — the oracle hash-check proves the sketch's
superset guarantee end-to-end, not just the final arithmetic.

Guarantee sketch: per-partition MG decrements remove ≥ k·m_p mass
(m_p = sum of that partition's decrement rounds), so Σm_p ≤ n/k before
the merge; the merge subtraction s removes ≥ k·s of the remaining
mass, so s + Σm_p ≤ n/k; any key with count > n/k keeps a positive
estimate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def mg_merge_counts(counters: dict, batch_counts: dict, k: int) -> None:
    """Merge exact ``batch_counts`` into a Misra-Gries(k) summary in
    place, using batched decrements: add, then while more than k-1
    counters remain, subtract the smallest counter value from all and
    drop zeros. Equivalent guarantee to item-at-a-time MG (each
    decrement round of size m removes ≥ k·m mass)."""
    for val, cnt in batch_counts.items():
        counters[val] = counters.get(val, 0) + int(cnt)
    while len(counters) > k - 1:
        m = min(counters.values())
        for val in list(counters):
            counters[val] -= m
            if counters[val] <= 0:
                del counters[val]
        if m == 0:  # pragma: no cover - defensive; counts are positive
            break


def partition_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """One Misra-Gries(k) summary per partition: (col, est) rows,
    ≤ k-1 per partition."""
    field = df.schema[col]
    schema = StructType([StructField(col, field.dataType)]).add("est", "long")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            mg_merge_counts(counters, pdf[col].value_counts().to_dict(), k)
        yield pd.DataFrame(
            {col: list(counters.keys()), "est": list(counters.values())}
        )

    return df.select(col).mapInPandas(summarize, schema=schema)


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """All NON-NULL keys of ``df[col]`` with count·k > n, with exact
    counts — computed via the MG candidate path (no full-key-space
    shuffle). NULL is excluded as a key EXPLICITLY (pandas
    ``value_counts`` drops NaN, so a null-heavy column would otherwise
    silently desync the sketch from the exact side); the n/k threshold
    is over non-null rows. Columns: (col, n_rows)."""
    df = df.where(F.col(col).isNotNull())
    partials = partition_summaries(df, col, k)
    combined = partials.groupBy(col).agg(F.sum("est").alias("c"))
    # mergeable-summaries reduction: subtract the k-th largest combined
    # estimate (0 if fewer than k survive). `combined` is ≤ partitions·k
    # rows — aggregate-sized, so the unpartitioned rank is a k-row
    # problem, not a corpus-sized one.
    ranked = combined.withColumn(
        "_r", F.row_number().over(Window.orderBy(F.col("c").desc()))
    )
    kth = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("_r") == k, F.col("c"))), F.lit(0)
        ).alias("_s")
    )
    candidates = (
        ranked.join(F.broadcast(kth))
        .where(F.col("c") - F.col("_s") > 0)
        .select(col)
    )
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        df.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .join(F.broadcast(total))
        .where(F.col("n_rows") * k > F.col("_n"))
        .drop("_n")
    )
