"""Streaming incremental dedup (IncrementalDedupIngest): per-batch
screening against the persisted band index, idempotent replay, and the
file-drip streaming path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from in_stream_processing_course_spark.streaming.ingest_dedup import (
    IncrementalDedupIngest,
)

_DOCS_B0 = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "one two three four five six seven"),
    (3, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1 (in-batch)
    (4, "red orange yellow green blue indigo violet"),
]
_DOCS_B1 = [
    (11, "alpha beta gamma delta epsilon zeta"),  # dup of corpus doc 1
    (12, "totally fresh content never seen before anywhere"),
    (13, "one two three four five six seven"),  # dup of corpus doc 2
]


def _make(tmp_path):
    return IncrementalDedupIngest(
        index_path=str(tmp_path / "index"),
        admitted_path=str(tmp_path / "admitted"),
        quarantine_path=str(tmp_path / "quarantine"),
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ingest_screens_and_grows_index(spark, tmp_path):
    ingest = _make(tmp_path)
    ingest(_df(spark, _DOCS_B0), 0)
    admitted0 = {r["doc_id"] for r in ingest.admitted(spark).collect()}
    # in-batch exact dup 3 collapsed onto 1; everything else novel
    assert admitted0 == {1, 2, 4}
    ingest(_df(spark, _DOCS_B1), 1)
    admitted = {r["doc_id"] for r in ingest.admitted(spark).collect()}
    assert admitted == {1, 2, 4, 12}
    quarantined = {
        r["doc_id"]: r["matched_doc_id"]
        for r in ingest.quarantined(spark).collect()
    }
    assert quarantined == {11: 1, 13: 2}
    # index holds bands only for admitted docs
    index_ids = {r["doc_id"] for r in ingest.index(spark).collect()}
    assert index_ids == {1, 2, 4, 12}


def test_ingest_replay_is_idempotent(spark, tmp_path):
    ingest = _make(tmp_path)
    ingest(_df(spark, _DOCS_B0), 0)
    ingest(_df(spark, _DOCS_B1), 1)
    before = (
        ingest.admitted(spark).count(),
        ingest.quarantined(spark).count(),
        ingest.index(spark).count(),
    )
    # checkpoint-recovery replay of the same micro-batch: dynamic
    # partition overwrite replaces batch_id=1, never double-appends
    ingest(_df(spark, _DOCS_B1), 1)
    after = (
        ingest.admitted(spark).count(),
        ingest.quarantined(spark).count(),
        ingest.index(spark).count(),
    )
    assert before == after


def test_ingest_streaming_file_drip(spark, tmp_path):
    """The real wiring: readStream file source -> foreachBatch ingest,
    one file per trigger — same outcomes as the direct-call path."""
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_foreach_batch,
    )

    import os
    import time

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # the file source orders by modification time — pin distinct mtimes
    # so b0 is provably the first micro-batch
    now = time.time()
    for i, (fname, rows) in enumerate(
        (("b0.json", _DOCS_B0), ("b1.json", _DOCS_B1))
    ):
        path = in_dir / fname
        with open(path, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(path, (now - 60 + 30 * i, now - 60 + 30 * i))
    ingest = _make(tmp_path)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    run_stream_foreach_batch(
        stream, ingest, "append", checkpoint_dir=str(tmp_path / "ckpt")
    )
    admitted = {r["doc_id"] for r in ingest.admitted(spark).collect()}
    quarantined = {r["doc_id"] for r in ingest.quarantined(spark).collect()}
    # file order is lexicographic, so b0 lands first; outcomes match
    # the direct-call tests
    assert admitted == {1, 2, 4, 12}
    assert quarantined == {11, 13}
    novel_flags = ingest.admitted(spark).select("doc_id").distinct().count()
    assert novel_flags == 4


def test_ingest_within_batch_near_dup_defers_to_min_id(spark, tmp_path):
    """Two identical texts arriving in ONE batch: only the min id
    survives (greedy representative), even with an empty index."""
    ingest = _make(tmp_path)
    rows = [
        (7, "same words in the same order here"),
        (9, "same words in the same order here"),
        (8, "different words entirely for this one"),
    ]
    ingest(_df(spark, rows), 0)
    admitted = {r["doc_id"] for r in ingest.admitted(spark).collect()}
    assert admitted == {7, 8}


def test_ingest_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """T6/T8 for the ingest op: stop after batch 0, drop a new file,
    restart on the SAME checkpoint — only the new file is processed
    (the b0 docs are not re-screened; index partitions stay 0 and 1)."""
    import os

    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_foreach_batch,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def write(fname, rows):
        path = in_dir / fname
        with open(path, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        return path

    ingest = _make(tmp_path)
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return spark.readStream.schema("doc_id long, text string").json(
            str(in_dir)
        )

    write("b0.json", _DOCS_B0)
    run_stream_foreach_batch(stream(), ingest, "append", checkpoint_dir=ckpt)
    assert {r["doc_id"] for r in ingest.admitted(spark).collect()} == {1, 2, 4}

    write("b1.json", _DOCS_B1)
    run_stream_foreach_batch(stream(), ingest, "append", checkpoint_dir=ckpt)
    admitted = {r["doc_id"] for r in ingest.admitted(spark).collect()}
    quarantined = {
        r["doc_id"]: r["matched_doc_id"]
        for r in ingest.quarantined(spark).collect()
    }
    assert admitted == {1, 2, 4, 12}
    assert quarantined == {11: 1, 13: 2}
    # index accreted exactly one partition per micro-batch
    parts = {
        d for d in os.listdir(tmp_path / "index") if d.startswith("batch_id=")
    }
    assert parts == {"batch_id=0", "batch_id=1"}
