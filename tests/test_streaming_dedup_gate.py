"""Streaming near-dup gate (streaming/dedup_gate.py): arrivals screen
against the persisted band index (cross-batch dupes caught through
index GROWTH), in-batch duplicate pairs resolve to the min id, a
checkpoint restart with more data converges exactly, and the verdicts
agree with the batch incremental operator run over the same split."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.dedup import (
    minhash_bands,
    minhash_index_matches,
)
from in_stream_processing_course_spark.streaming.dedup_gate import (
    MinHashDedupGate,
    build_band_index,
    screen_document_stream,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

_DOC_SCHEMA = "doc_id long, text string"

_CORPUS_TEXT = "the quick brown fox jumps over the lazy dog again and again"
_NOVEL_TEXT = "entirely different content about spark structured streaming"
_NOVEL2_TEXT = "a third unrelated passage concerning byte pair encoding"


def _write_chunk(in_dir, name: str, rows: list[tuple[int, str]]) -> None:
    with open(in_dir / name, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _verdicts(spark, path) -> dict:
    return {
        r["doc_id"]: (r["matched_doc_id"], r["is_novel"])
        for r in spark.read.parquet(path).collect()
    }


def test_dedup_gate_screens_grows_and_restarts(spark, tmp_path):
    index = str(tmp_path / "index")
    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    # corpus of one known document (id 1); the index starts from it
    corpus = spark.createDataFrame([(1, _CORPUS_TEXT)], _DOC_SCHEMA)
    build_band_index(corpus, index)

    # batch 1: 10 = dup of corpus, 11+12 = in-batch dup pair (novel to
    # the index), 13 = novel singleton
    _write_chunk(
        in_dir,
        "c0.json",
        [(10, _CORPUS_TEXT), (11, _NOVEL_TEXT), (12, _NOVEL_TEXT), (13, _NOVEL2_TEXT)],
    )
    time.sleep(1.1)
    # batch 2: 20 = dup of batch-1 NOVEL doc 11 (only catchable if the
    # index grew), 21 = dup of corpus
    _write_chunk(in_dir, "c1.json", [(20, _NOVEL_TEXT), (21, _CORPUS_TEXT)])

    gate = MinHashDedupGate(spark, index, verdicts)
    stream = spark.readStream.schema(_DOC_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    await_drained(screen_document_stream(stream, gate, ckpt))

    got = _verdicts(spark, verdicts)
    assert got[10] == (1, False)  # cross: corpus dup
    assert got[11] == (None, True)  # novel, becomes the group anchor
    assert got[12] == (11, False)  # in-batch dup resolves to min id
    assert got[13] == (None, True)
    assert got[20] == (11, False)  # caught via INDEX GROWTH
    assert got[21] == (1, False)

    # index grew by exactly the novel docs' bands
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(index).select("doc_id").distinct().collect()
    }
    assert idx_ids == {1, 11, 13}

    # restart with a third batch, SAME checkpoint: 30 dups batch-2's
    # rejected doc 20? no — 20 was not novel, so 30 must match 11 too;
    # 31 dups the other anchor 13
    time.sleep(1.1)
    _write_chunk(in_dir, "c2.json", [(30, _NOVEL_TEXT), (31, _NOVEL2_TEXT)])
    gate2 = MinHashDedupGate(spark, index, verdicts)
    stream2 = spark.readStream.schema(_DOC_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    await_drained(screen_document_stream(stream2, gate2, ckpt))
    got = _verdicts(spark, verdicts)
    assert got[30] == (11, False)
    assert got[31] == (13, False)
    assert len(got) == 8  # no re-screening of committed batches

    # batch-operator agreement: probing all arrivals against the FINAL
    # grown index with the one-shot batch operator reproduces every
    # streamed verdict (anchors 11/13 excluded — they ARE index rows
    # now, and the batch operator has no self-exclusion)
    final_idx = spark.read.parquet(index)
    arrivals = spark.read.schema(_DOC_SCHEMA).json(str(in_dir))
    probe_ids = [10, 12, 20, 21, 30, 31]
    batch_verdict = {
        r["doc_id"]: (r["matched_doc_id"], r["is_novel"])
        for r in minhash_index_matches(
            final_idx,
            minhash_bands(arrivals.where(F.col("doc_id").isin(probe_ids))),
        ).collect()
    }
    assert {d: got[d] for d in probe_ids} == batch_verdict


def test_dedup_gate_honors_custom_id_col(spark, tmp_path):
    """Regression (r8 review): the index read schema must derive from
    id_col — a hardcoded doc_id schema read a vec_id-keyed index as
    all-NULL and every duplicate screened as novel."""
    index = str(tmp_path / "index")
    verdicts = str(tmp_path / "verdicts")
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    corpus = spark.createDataFrame(
        [(1, _CORPUS_TEXT)], "vec_id long, text string"
    )
    build_band_index(corpus, index, id_col="vec_id")
    with open(in_dir / "c0.json", "w") as f:
        for vec_id, text in [(10, _CORPUS_TEXT), (11, _NOVEL_TEXT)]:
            f.write(json.dumps({"vec_id": vec_id, "text": text}) + "\n")

    gate = MinHashDedupGate(spark, index, verdicts, id_col="vec_id")
    stream = spark.readStream.schema("vec_id long, text string").json(
        str(in_dir)
    )
    await_drained(
        screen_document_stream(stream, gate, str(tmp_path / "ckpt"))
    )
    got = {
        r["vec_id"]: (r["matched_doc_id"], r["is_novel"])
        for r in spark.read.parquet(verdicts).collect()
    }
    assert got[10] == (1, False)  # would be (None, True) under the bug
    assert got[11] == (None, True)


def test_dedup_gate_honors_non_long_id_type(spark, tmp_path):
    """Regression (r8 advice): the index read schema must derive the id
    column's TYPE from the batch, not hardcode long — a string-keyed
    index read back as long surfaces as all-NULL ids and every
    duplicate silently screens as novel."""
    index = str(tmp_path / "index")
    verdicts = str(tmp_path / "verdicts")
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    corpus = spark.createDataFrame(
        [("corpus-001", _CORPUS_TEXT)], "doc_id string, text string"
    )
    build_band_index(corpus, index)
    with open(in_dir / "c0.json", "w") as f:
        for doc_id, text in [
            ("arrival-b", _CORPUS_TEXT),  # dup of corpus
            ("arrival-c", _NOVEL_TEXT),  # novel anchor
            ("arrival-d", _NOVEL_TEXT),  # in-batch dup → min string id
        ]:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    gate = MinHashDedupGate(spark, index, verdicts)
    stream = spark.readStream.schema("doc_id string, text string").json(
        str(in_dir)
    )
    await_drained(
        screen_document_stream(stream, gate, str(tmp_path / "ckpt"))
    )
    got = {
        r["doc_id"]: (r["matched_doc_id"], r["is_novel"])
        for r in spark.read.parquet(verdicts).collect()
    }
    assert got["arrival-b"] == ("corpus-001", False)  # NULL-id bug → novel
    assert got["arrival-c"] == (None, True)
    assert got["arrival-d"] == ("arrival-c", False)
    # the grown index keeps string ids readable
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(index).select("doc_id").distinct().collect()
    }
    assert idx_ids == {"corpus-001", "arrival-c"}
