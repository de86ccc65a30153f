"""Streaming linear-probe gate (streaming/probe_gate.py): gating the
embedding corpus as a dripped parquet stream reproduces the batch
``embedding_probe_gate`` verdicts row for row (stream == batch), a
checkpoint restart with more data converges exactly (keyed upsert, no
double verdicts), the persisted artifact round-trips with a dense-dim
hard check, and an unlabeled fit set fails loud."""

from __future__ import annotations

import glob
import shutil
import time

import pytest
from pyspark.sql import functions as F

from in_stream_processing_course_spark.streaming.probe_gate import (
    ProbeGate,
    gate_vector_stream,
    load_probe_model,
    save_probe_model,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

SF = "/root/testdata/sf0.01"
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _drip(df, stage_dir, in_dir, name) -> None:
    """Materialize one chunk as a single parquet part file in the
    streamed directory (parquet drip keeps float32 embeddings
    bit-exact; a JSON drip would round-trip through decimal text)."""
    df.coalesce(1).write.mode("overwrite").parquet(str(stage_dir))
    (part,) = glob.glob(f"{stage_dir}/part-*.parquet")
    shutil.copy(part, str(in_dir / name))


def _verdicts(spark, path) -> dict:
    return {
        r["vec_id"]: (r["label"], r["margin"], r["selected"])
        for r in spark.read.parquet(path).collect()
    }


def test_probe_gate_matches_batch_and_restarts(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    models = str(tmp_path / "model")
    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    save_probe_model(spark, emb, models)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    chunk_a = emb.where(F.col("vec_id") % 2 == 0)
    chunk_b = emb.where(F.col("vec_id") % 2 == 1)
    _drip(chunk_a, tmp_path / "stage", in_dir, "a.parquet")

    def run():
        gate = ProbeGate(spark, models, verdicts)
        stream = spark.readStream.schema(_EMB_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(in_dir))
        await_drained(gate_vector_stream(stream, gate, ckpt))

    run()
    got = _verdicts(spark, verdicts)
    assert set(got) == {
        r["vec_id"] for r in chunk_a.select("vec_id").collect()
    }

    # restart with MORE data on the SAME checkpoint: only the new
    # chunk screens; committed verdicts stay put (keyed upsert)
    time.sleep(1.1)
    _drip(chunk_b, tmp_path / "stage", in_dir, "b.parquet")
    run()
    got = _verdicts(spark, verdicts)

    # stream == batch: the registered query over the same corpus
    # (at this SF the md5 fit sample is the whole corpus, so the
    # artifact fit and the registered fit coincide)
    from in_stream_processing_course_spark.plans.similarity_queries import (
        embedding_probe_gate,
    )

    want = {
        r["vec_id"]: (r["label"], r["margin"], r["selected"])
        for r in embedding_probe_gate(spark, SF).collect()
    }
    assert got == want

    # the gate actually discriminates: non-trivial selection overall,
    # and the target label is ENRICHED relative to the rest
    sel = {k for k, v in got.items() if v[2]}
    assert sel and len(sel) < len(got)
    tgt = {k for k, v in got.items() if v[0] == 0}
    frac_tgt = len(sel & tgt) / len(tgt)
    frac_rest = len(sel - tgt) / (len(got) - len(tgt))
    assert frac_tgt > frac_rest


def test_probe_model_roundtrip_and_dense_check(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "model")
    save_probe_model(spark, emb, path)
    w, thr = load_probe_model(spark, path)
    assert len(w) == 65 and isinstance(thr, float)

    # a sparse dim index must fail loud, not silently shift weights
    spark.read.parquet(f"{path}/weights").where(
        F.col("dim") != 3
    ).write.mode("overwrite").parquet(f"{tmp_path}/broken/weights")
    spark.read.parquet(f"{path}/meta").write.mode("overwrite").parquet(
        f"{tmp_path}/broken/meta"
    )
    with pytest.raises(ValueError, match="dense 0..dim-1"):
        load_probe_model(spark, f"{tmp_path}/broken")


def test_probe_gate_unlabeled_fit_fails_loud(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding", F.lit(None).cast("int").alias("label")
    )
    with pytest.raises(ValueError, match="empty fit set"):
        save_probe_model(spark, emb, str(tmp_path / "m"))
