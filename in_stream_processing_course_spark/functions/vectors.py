"""Vector math over ``array<float>`` embedding columns (north-star X2)
as native Column algebra: ``zip_with`` + ``aggregate`` stay JVM-side,
so brute-force cosine scans run inside codegen with no Python transfer.

All arithmetic is done in double after an explicit element cast, with a
fixed left-to-right summation order — bit-identical to the DuckDB
oracle computing the same fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dsum(arr: Column) -> Column:
    """Sequential double-precision fold (deterministic order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return _dsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm_col(a: Column) -> Column:
    return F.sqrt(_dsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def sqdist_col(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (deterministic fold order)."""
    return _dsum(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        )
    )


def l2_normalize_col(a: Column) -> Column:
    """a / ||a||₂ as array<double>; zero vectors pass through unscaled.

    On the unit sphere Euclidean and cosine orderings coincide
    (||u-v||² = 2 - 2·u·v), which is what lets a Euclidean k-means
    index serve cosine queries without metric mismatch.

    The norm is hoisted OUT of the per-element lambda (r9 perf): a
    scalar expression referenced inside ``F.transform``'s lambda is
    re-evaluated per ELEMENT by the interpreted HOF evaluator, so the
    old ``transform(a, x -> x / safe)`` form cost 2 norm-folds × dim
    per row (≈128 folds for dim 64); routing the scalar through
    ``array_repeat`` evaluates it exactly once per row. Same divide,
    same doubles, same element order — bit-identical output, ~100×
    fewer interpreted ops when Catalyst inlines this tree many times
    (e.g. one copy per centroid in the IVF probe path).
    """
    n = norm_col(a)
    safe = F.when(n > 0, n).otherwise(F.lit(1.0))
    return F.zip_with(
        a,
        F.array_repeat(safe, F.size(a)),
        lambda x, s: x.cast("double") / s,
    )


def sign_bucket_col(a: Column, n_bits: int = 8) -> Column:
    """Coordinate-sign LSH bucket: bit i = sign(a[i]); deterministic,
    engine-portable blocking key for the bucketed ANN variant. A
    production variant would use seeded random hyperplanes; the bucket
    join/rerank plumbing is identical.
    """
    bits = [
        F.when(F.element_at(a, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")
