"""Multimodal binary-column plumbing (X4): schema contract, Arrow
batch shapes, stubbed codec behavior, frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.multimodal import (
    decode_images,
    documents_as_media,
    extract_media_meta,
    fake_decode_meta,
    sample_frames,
)
from in_stream_processing_course_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(load_table(spark, sf_dir, "documents"))


def test_media_schema_contract(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "kind",
        "payload",
        "meta",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_meta_matches_python_hash(spark, media):
    row = media.where(F.col("media_id") == 0).collect()[0]
    meta = extract_media_meta(media).where(F.col("media_id") == 0).collect()[0]
    assert meta["n_bytes"] == len(row["payload"])
    assert meta["sha256"] == hashlib.sha256(row["payload"]).hexdigest()


def test_fake_decode_deterministic(spark, media):
    a = {(r["media_id"], r["width"], r["height"]) for r in fake_decode_meta(media).collect()}
    b = {(r["media_id"], r["width"], r["height"]) for r in fake_decode_meta(media).collect()}
    assert a == b and len(a) > 0
    # dimensions are in the documented 16..1024 multiples-of-16 range
    assert all(16 <= w <= 1024 and w % 16 == 0 for _, w, _h in a)


def test_real_decode_raises_without_codec(spark, media):
    """The real codec path fails loudly (NotImplementedError), not
    silently, when the library is absent."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; stub-behavior test not applicable")
    except ImportError:
        pass
    with pytest.raises(Exception) as exc_info:
        decode_images(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(
        exc_info.value
    )


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.requires_pil
@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_real_decode_and_resize_golden(spark):
    """Golden test for the REAL codec path (runs only where Pillow
    exists): a synthetic 64x32 mid-gray PNG decodes to its exact
    dimensions and luma, and resize_images honors the thumbnail
    contract (longer side -> max_side, aspect preserved)."""
    import io

    from PIL import Image

    from in_stream_processing_course_spark.operators.multimodal import (
        resize_images,
    )

    buf = io.BytesIO()
    Image.new("L", (64, 32), color=128).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(0, "image", bytearray(buf.getvalue()), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    decoded = decode_images(df).collect()[0]
    assert (decoded["width"], decoded["height"]) == (64, 32)
    assert abs(decoded["mean_luma"] - 128.0) < 0.5
    resized = resize_images(df, max_side=16).collect()[0]
    assert (resized["width"], resized["height"]) == (16, 8)


def test_frame_sampling_shapes(spark, media):
    frames = sample_frames(media, n_frames=4, frame_bytes=32)
    counts = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    lens = frames.select(F.length("frame_bytes").alias("n")).collect()
    assert all(0 < r["n"] <= 32 for r in lens)


# --- payload simhash / phash near-dups --------------------------------------


def _phash_of(spark, payloads):
    from in_stream_processing_course_spark.operators.multimodal import (
        payload_simhash,
    )

    media = spark.createDataFrame(
        [(i, "image", bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary",
    )
    return {
        r["media_id"]: r["phash"] for r in payload_simhash(media).collect()
    }


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_payload_simhash_locality(spark):
    base = ("the quick brown fox jumps over the lazy dog " * 20).encode()
    near = bytearray(base)
    near[10] ^= 0xFF  # one corrupted byte
    far = ("completely unrelated payload content entirely " * 20).encode()
    h = _phash_of(spark, [base, bytes(base), bytes(near), far])
    assert h[0] == h[1], "identical payloads must collide exactly"
    assert _hamming(h[0], h[2]) <= 12, "one-byte edit stays Hamming-near"
    assert _hamming(h[0], h[3]) > 12, "unrelated content is Hamming-far"


def test_phash_candidates_find_planted_pair_and_block(spark):
    from in_stream_processing_course_spark.operators.multimodal import (
        payload_simhash,
        phash_candidates,
    )

    # high-entropy base: many distinct grams, so a one-byte edit only
    # perturbs ~4 of them (a repetitive payload has few unique grams
    # and each carries a big vote share — edits would swing many bits)
    base = " ".join(
        f"token{i} unique piece {i * 37}" for i in range(120)
    ).encode()
    near = bytearray(base)
    near[5] ^= 0x01
    payloads = [base, bytes(near)] + [
        " ".join(
            f"filler{i}_{j} word {j * 17 + i}" for j in range(100)
        ).encode()
        for i in range(40)
    ]
    media = spark.createDataFrame(
        [(i, "image", bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary",
    )
    sig = payload_simhash(media)
    cands = phash_candidates(sig)
    pairs = {(r["a"], r["b"]) for r in cands.collect()}
    assert (0, 1) in pairs, "planted near-dup must be a candidate"
    # blocking: the physical plan joins on band keys, never cross
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phash_oracle_ascii_guard_raises_on_multibyte():
    """The pHash oracle's byte<->char replay is only valid for pure
    ASCII text; ascii_guard must error() with a NAMED message on a
    multibyte fixture instead of silently hash-diverging (ADVICE r11).
    Two rows minimum: DuckDB 1.0's single-row inequality self-join
    short-circuits before evaluating the guard CTE (degenerate; real
    fixtures have thousands of docs)."""
    import duckdb

    from in_stream_processing_course_spark.plans.multimodal_queries import (
        ORACLE_PHASH_NEAR_DUPS,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'héllo wörld this is a doc'), "
        "(2, 'plain ascii text here ok')) t(doc_id, text)"
    )
    with pytest.raises(duckdb.Error, match="pure ASCII"):
        con.execute(ORACLE_PHASH_NEAR_DUPS).fetchall()
    # clean ASCII fixture passes through the guard untouched
    con2 = duckdb.connect()
    con2.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'plain ascii doc one two'), "
        "(2, 'plain ascii doc one two')) t(doc_id, text)"
    )
    assert con2.execute(ORACLE_PHASH_NEAR_DUPS).fetchall() == [(1, 2, 0)]
