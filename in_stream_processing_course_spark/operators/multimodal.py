"""Multimodal column operators (north-star X4): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The actual codec step is STUBBED: media
libraries (PIL/torchaudio/av) are not in this container, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
the library import succeeds, and ``fake_decode_meta`` provides a
deterministic stand-in (dimensions derived from payload bytes) used by
tests and the fake-decode query.

Scale notes: binary payloads ride Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads
fits executor memory. Feature extraction is embarrassingly parallel —
no shuffle anywhere in this module; downstream joins hash on media_id
only (never on payload bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import MEDIA_SCHEMA  # noqa: F401  (public: table contract)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the driver ``documents``
    table (no external fixtures): payload = utf-8 bytes of the text,
    kind assigned round-robin. Exercises the binary-column contract
    end-to-end with real driver data.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction (size + content hash) via
    ``mapInPandas`` — the canonical shape for any per-payload Python
    feature extractor. One output row per input row; batches stream
    through the Python worker without materializing the partition.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(batches, META_SCHEMA)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def decode_images(media: DataFrame) -> DataFrame:
    """REAL decode path (requires Pillow, absent in this container):
    mapInPandas batches decode payload bytes into (width, height,
    mean luma). Raises NotImplementedError at execution time when the
    codec library is unavailable — the plan/schema/UDF contract is
    identical to :func:`fake_decode_meta`, which tests use.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _try_import_pil()
        if Image is None:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "use fake_decode_meta for the deterministic stand-in"
            )
        import io

        import numpy as np

        for pdf in it:
            ims = [Image.open(io.BytesIO(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [im.width for im in ims],
                    "height": [im.height for im in ims],
                    "mean_luma": [
                        float(np.asarray(im.convert("L")).mean()) for im in ims
                    ],
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(batches, DECODED_SCHEMA)


def fake_decode_meta(media: DataFrame) -> DataFrame:
    """Deterministic stand-in decoder: derives (width, height,
    mean_luma) from the payload's sha256 bytes. Same schema, same
    mapInPandas batch shape, fully testable without codecs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = pdf["payload"].map(lambda b: hashlib.sha256(b).digest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": digests.map(lambda d: 16 * (1 + d[0] % 64)).astype(
                        "int32"
                    ),
                    "height": digests.map(lambda d: 16 * (1 + d[1] % 64)).astype(
                        "int32"
                    ),
                    "mean_luma": digests.map(lambda d: round(d[2] / 255.0, 6)),
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """REAL resize path (requires Pillow, absent in this container):
    decode, thumbnail to ``max_side``, re-encode. Same
    raise-at-execution contract as :func:`decode_images`; the
    plan/schema shape is shared with :func:`fake_resize_dims`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _try_import_pil()
        if Image is None:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "use fake_resize_dims for the deterministic stand-in"
            )
        import io

        for pdf in it:
            rows = {"media_id": [], "width": [], "height": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                im = Image.open(io.BytesIO(b))
                im.thumbnail((max_side, max_side))
                rows["media_id"].append(mid)
                rows["width"].append(im.width)
                rows["height"].append(im.height)
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return media.where(F.col("kind") == "image").mapInPandas(batches, schema)


def fake_resize_dims(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Aspect-preserving resize arithmetic over (fake-)decoded
    dimensions — the thumbnail contract (scale so the longer side is
    ``max_side``, never upscale) as native Column algebra; IEEE double
    scale then floor, so the result is engine-portable."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest("width", "height").cast("double"),
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.greatest(
            F.lit(1), F.floor(F.col("width") * scale).cast("int")
        ).alias("resized_width"),
        F.greatest(
            F.lit(1), F.floor(F.col("height") * scale).cast("int")
        ).alias("resized_height"),
    )


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 32
) -> DataFrame:
    """Frame sampling for video payloads: slice ``n_frames`` evenly
    spaced byte windows (stand-in for real keyframe extraction; the
    explode-per-frame output shape is what a real sampler produces).
    Native Column algebra — no Python needed for the slicing itself.
    """
    total = F.length("payload")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    offsets = F.transform(
        idx, lambda i: (i * F.greatest(total - frame_bytes, F.lit(1)))
        / F.lit(max(n_frames - 1, 1))
    )
    frames = F.transform(
        offsets,
        lambda off: F.substring(
            F.col("payload"), (off.cast("int") + 1), frame_bytes
        ),
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(frames).alias("frame_idx", "frame_bytes"),
        )
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def payload_simhash(
    media: DataFrame, n_bits: int = 64, ngram: int = 4
) -> DataFrame:
    """Perceptual-hash-shaped near-dup fingerprint for BINARY payloads:
    64-bit SimHash over the payload's byte ``ngram`` windows. Two
    payloads differing in a few bytes land within a few Hamming bits
    of each other — the binary-content analog of the image pHash
    pipeline (with real codecs the same votes would come from DCT
    coefficients; the banding/verify stages downstream are identical
    either way, so the 100 TB plumbing is fully exercised without
    PIL).

    Arrow-batched ``mapInPandas`` with NumPy vectorization inside the
    batch (sliding windows -> unique gram keys -> splitmix64 mix ->
    per-bit votes) — no per-byte Python loop, no shuffle.
    """
    assert n_bits == 64, "phash is a single packed int64"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        bit_idx = np.arange(n_bits, dtype=np.uint64)

        def one(b: bytes) -> int:
            arr = np.frombuffer(b, dtype=np.uint8)
            if len(arr) < ngram:
                arr = np.pad(arr, (0, ngram - len(arr)))
            win = np.lib.stride_tricks.sliding_window_view(arr, ngram)
            keys = win.astype(np.uint64) @ (
                np.uint64(256) ** np.arange(ngram - 1, -1, -1, dtype=np.uint64)
            )
            keys = np.unique(keys)
            # splitmix64 finalizer — a public-domain 64-bit mixer
            z = (keys + np.uint64(0x9E3779B97F4A7C15))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            bits = (z[:, None] >> bit_idx) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            packed = np.uint64(0)
            for j in np.nonzero(votes >= 0)[0]:
                packed |= np.uint64(1) << np.uint64(j)
            return int(packed.astype(np.int64))

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["payload"].map(one).astype("int64"),
                }
            )

    return media.mapInPandas(batches, PHASH_SCHEMA)


def phash_candidates(
    sig: DataFrame, bands: int = 4, max_hamming: int = 12
) -> DataFrame:
    """Banded Hamming-near candidate pairs over packed 64-bit
    fingerprints — pure Column algebra after the fingerprint stage:
    each hash explodes to ``bands`` 16-bit band keys (two near hashes
    share at least one band whenever their differing bits miss one
    band — the pigeonhole guarantee for <= bands-1 scattered diffs);
    candidates come from a (band_id, band_key) equi-join (NO cross
    product, same blocking discipline as text SimHash/MinHash), and
    the exact Hamming check (`bit_count(a XOR b)`) runs only within
    blocks."""
    width = 64 // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), i * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    l = banded.select(
        F.col("media_id").alias("a"),
        F.col("phash").alias("ph_a"),
        "band_id",
        "band_key",
    )
    r = banded.select(
        F.col("media_id").alias("b"),
        F.col("phash").alias("ph_b"),
        "band_id",
        "band_key",
    )
    pairs = (
        l.join(r, ["band_id", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ph_a", "ph_b")
        .distinct()
    )
    return pairs.select(
        "a",
        "b",
        F.bit_count(
            F.col("ph_a").bitwiseXOR(F.col("ph_b"))
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
