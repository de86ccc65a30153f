"""Deduplication family over document tables (north-star X1/X2):
exact, MinHash+LSH, SimHash, n-gram Jaccard. All engine-portable
Column algebra (md5-based hashing — identical in DuckDB) so every
variant has an exact SQL oracle; pandas-UDF variants are not needed
because nothing here leaves the JVM.

Scale design: every near-dup variant is *blocked* — candidate pairs
come from an equi-join on a bucket key (LSH band signature, simhash
band, or cheap blocking key), never from a cross join. At 100 TB the
bucket join shuffles on the band key, AQE handles skewed buckets, and
per-bucket pair counts stay bounded by band tuning (bands x rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """X1 — exact dedup. dropDuplicates = groupBy(cols) keep-first;
    hash-shuffle on the dedup key, map-side partial dedup first.
    """
    return df.dropDuplicates(cols)


def shingles_col(text: Column, k: int = 5) -> Column:
    """Word k-shingles (distinct) of lowercased text."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )


def minhash_signature_col(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: element i = lexicographic min of
    ``md5(i || shingle)`` over the shingle set. md5 is available and
    bit-identical in every engine (unlike murmur3), so the oracle can
    reproduce signatures exactly; min-of-hash over a random oracle is
    the standard MinHash estimator regardless of hash output ordering.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s))
            )
        ),
    )


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """doc -> (band_id, band_key) rows for LSH bucketing.

    band_key = concat of the band's rows of the signature; two docs
    collide in a band iff that slice matches exactly.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature_col(shingles_col(F.col(text_col), shingle_k), num_hashes)
    banded = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band_id"),
                    F.array_join(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band), "|"
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_key")
    return banded


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """LSH candidate pairs: self-equi-join banded docs on
    (band_id, band_key), distinct (a < b) pairs. The join is a plain
    shuffle-hash/sort-merge equi-join — no cross product anywhere.
    """
    banded = minhash_bands(df, id_col, text_col, num_hashes, bands, shingle_k)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
        )
        .distinct()
    )
    return pairs


def jaccard_col(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays (double)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    blocking: str = "source",
) -> DataFrame:
    """n-gram Jaccard near-dup within blocking groups: candidate pairs
    from an equi-join on a cheap blocking key, then exact Jaccard on
    word-shingle sets, keep pairs >= threshold.
    """
    with_sh = df.select(
        F.col(id_col),
        F.col(blocking).alias("_block"),
        shingles_col(F.col(text_col), shingle_k).alias("_sh"),
    )
    l, r = with_sh.alias("l"), with_sh.alias("r")
    return (
        l.join(
            r,
            (F.col("l._block") == F.col("r._block"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.round(jaccard_col(F.col("l._sh"), F.col("r._sh")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


_HEX = "0123456789abcdef"


def _hex_nibble(c: Column) -> Column:
    """hex char -> 0..15 without engine-specific conversions."""
    return F.instr(F.lit(_HEX), c) - 1


def simhash_col(text: Column, n_bits: int = 32) -> Column:
    """SimHash over whitespace tokens. Per token, take the first
    ``n_bits/4`` hex chars of md5(token) as the bit source; per bit,
    sum +1/-1 votes across tokens; bit set iff vote > 0. Entirely
    portable (md5 + per-nibble arithmetic), so the oracle reproduces it
    bit-for-bit. Returns a bigint.
    """
    n_nibbles = n_bits // 4
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)
    hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, n_nibbles))
    # votes[i] (i in 0..n_bits-1) = sum over tokens of (bit_i ? 1 : -1)
    bit_idx = F.sequence(F.lit(0), F.lit(n_bits - 1))

    def bit_vote(i: Column) -> Column:
        nib = F.floor(i / 4).cast("int")
        shift = (i % 4).cast("int")  # bit within nibble, LSB first
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                (
                    F.floor(
                        _hex_nibble(F.substring(h, nib + 1, 1))
                        / F.pow(F.lit(2.0), shift.cast("double"))
                    ).cast("long")
                    % 2
                )
                == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )

    bits = F.transform(
        bit_idx,
        lambda i: F.when(bit_vote(i) > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash_dedup_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 32,
    band_bits: int = 8,
) -> DataFrame:
    """SimHash near-dup candidates: split the fingerprint into
    ``n_bits/band_bits`` bands; docs agreeing on any band are
    candidates (Hamming-distance blocking); report exact Hamming
    distance via xor bit count.
    """
    n_bands = n_bits // band_bits
    sh = df.select(F.col(id_col), simhash_col(F.col(text_col), n_bits).alias("_sh"))
    bands = sh.select(
        id_col,
        "_sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band_id"),
                    (
                        F.floor(
                            F.col("_sh") / F.pow(F.lit(2.0), (b * band_bits).cast("double"))
                        ).cast("long")
                        % (1 << band_bits)
                    ).alias("band_val"),
                ),
            )
        ).alias("band"),
    ).select(id_col, "_sh", "band.band_id", "band.band_val")
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.bit_count(F.col("l._sh").bitwiseXOR(F.col("r._sh"))).cast("long").alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return pairs
