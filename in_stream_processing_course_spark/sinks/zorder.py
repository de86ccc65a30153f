"""Z-order clustered layout — multi-dimensional data skipping for the
100 TB scan path.

Hive partitioning (partitioned.py) prunes on ONE derived key; sorting
within files prunes on ONE secondary key. When queries filter on TWO
independent keys (user AND time, tenant AND date), a linear sort
clusters only its leading column — files span the full domain of the
other key and nothing prunes. Interleaving the bits of both keys into
a single Z-value and range-partitioning + sorting on it bounds every
file to a small rectangle of the (x, y) key space, so parquet
footer min/max stats skip most files for point or range predicates on
EITHER column (the same layout Delta's OPTIMIZE ZORDER BY and
Databricks/Iceberg clustering build; Morton order, public knowledge).

Everything is native Column algebra: the bit interleave is one
generated SQL expression (bit_count-style arithmetic folds, no UDF),
so the write is a repartitionByRange + sortWithinPartitions — one
range shuffle, exactly what a linear sort write would cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per dimension; 2 x 16 = 32-bit Z-values


def _scale_expr(col: str, lo: str, hi: str, bits: int) -> str:
    """SQL expr mapping col into [0, 2^bits) by linear domain scaling.

    Divide-first form: step = ceil(width / 2^bits), scaled =
    (col - lo) DIV step. Never multiplies the offset, so the full
    64-bit key domain (snowflake-style ids) is overflow-safe — the
    multiply-then-divide form blows past BIGINT once width > ~2^47.
    Degenerate single-value domains map to 0; narrow domains stay in
    their low bits, which Morton interleave handles identically."""
    width = f"(CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT) + 1)"
    step = f"greatest(({width} + {(1 << bits) - 1}) DIV {1 << bits}, 1)"
    return (
        f"CAST((CAST({col} AS BIGINT) - CAST({lo} AS BIGINT))"
        f" DIV {step} AS BIGINT)"
    )


def zorder_key(
    x: str, y: str, x_lo: str, x_hi: str, y_lo: str, y_hi: str,
    bits: int = Z_BITS,
) -> Column:
    """Morton (Z-curve) key of two numeric columns, given their domain
    bounds as SQL expressions (columns or literals).

    Built as one SQL string — 2*bits shift-and-test terms — because
    Column-by-Column composition costs a py4j round-trip per term
    (see operators/dedup.simhash_table)."""
    sx = f"({_scale_expr(x, x_lo, x_hi, bits)})"
    sy = f"({_scale_expr(y, y_lo, y_hi, bits)})"
    terms = []
    for i in range(bits):
        terms.append(f"((({sx} DIV {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({sy} DIV {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return F.expr(" + ".join(terms))


def write_events_zordered(
    df: DataFrame, out_dir: str, n_files: int = 16, bits: int = Z_BITS
) -> None:
    """events -> parquet clustered on Z(user_id, epoch_day).

    Domain bounds ride along as window-free scalar aggregates via a
    1-row broadcast join (no driver collect): the plan stays fully
    distributed and the bounds are computed in the same job as the
    write. Range partitioning on the Z-key gives each output file a
    contiguous Z-range == a bounded rectangle in (user, day) space.
    """
    bounds = df.agg(
        F.min("user_id").alias("_ulo"),
        F.max("user_id").alias("_uhi"),
        F.expr("MIN(unix_timestamp(ts) DIV 86400)").alias("_dlo"),
        F.expr("MAX(unix_timestamp(ts) DIV 86400)").alias("_dhi"),
    )
    z = zorder_key(
        "user_id", "(unix_timestamp(ts) DIV 86400)",
        "_ulo", "_uhi", "_dlo", "_dhi", bits,
    )
    (
        df.join(F.broadcast(bounds))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_ulo", "_uhi", "_dlo", "_dhi")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
