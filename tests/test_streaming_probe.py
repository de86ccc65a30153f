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

    # a truncated-but-DENSE table passes the density check but must
    # still fail loud against the persisted dim (ADVICE r9: otherwise
    # zip_with pads features against the short weight array and the
    # gate upserts silently-NULL verdicts)
    spark.read.parquet(f"{path}/weights").where(
        F.col("dim") < 10
    ).write.mode("overwrite").parquet(f"{tmp_path}/short/weights")
    spark.read.parquet(f"{path}/meta").write.mode("overwrite").parquet(
        f"{tmp_path}/short/meta"
    )
    with pytest.raises(ValueError, match="model dimension"):
        load_probe_model(spark, f"{tmp_path}/short")


def test_probe_gate_unlabeled_fit_fails_loud(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding", F.lit(None).cast("int").alias("label")
    )
    with pytest.raises(ValueError, match="empty fit set"):
        save_probe_model(spark, emb, str(tmp_path / "m"))


def test_margin_drift_monitor_stream_matches_batch_and_detects_shift(
    spark, tmp_path
):
    """VERDICT r9 next-round #6: the maintained margin histogram (a)
    equals the batch histogram after a drained drip, (b) restarts
    without double counting, (c) reports ~zero drift on the training
    distribution and (d) flips ``stale`` on a shifted margin
    distribution — the documented recalibration trigger."""
    from in_stream_processing_course_spark.streaming.probe_gate import (
        MARGIN_TVD_RECALIBRATE,
        margin_drift,
        margin_hist,
        margin_hist_maintain,
    )
    from in_stream_processing_course_spark.plans.similarity_queries import (
        _margin_col,
        _probe_feats_col,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    models = str(tmp_path / "model")
    save_probe_model(spark, emb, models)
    w, _thr = load_probe_model(spark, models)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table = str(tmp_path / "margins")
    ckpt = str(tmp_path / "ckpt")
    half = emb.where(F.col("vec_id") % 2 == 0)
    _drip(half, tmp_path / "stage0", in_dir, "c0.parquet")
    stream = spark.readStream.schema(_EMB_SCHEMA).parquet(str(in_dir))
    await_drained(margin_hist_maintain(stream, w, table, ckpt))

    def hist(df):
        return {
            r["bucket"]: r["c"]
            for r in margin_hist(
                df.select(_margin_col(w, _probe_feats_col()).alias("margin"))
            ).collect()
        }

    got = {
        r["bucket"]: r["c"]
        for r in spark.read.parquet(table).select("bucket", "c").collect()
    }
    assert got == hist(half)

    # restart with the other half, SAME checkpoint: converges exactly
    # on the full-corpus histogram (no double counting)
    time.sleep(1.1)
    _drip(
        emb.where(F.col("vec_id") % 2 == 1),
        tmp_path / "stage1",
        in_dir,
        "c1.parquet",
    )
    stream2 = spark.readStream.schema(_EMB_SCHEMA).parquet(str(in_dir))
    await_drained(margin_hist_maintain(stream2, w, table, ckpt))
    got2 = {
        r["bucket"]: r["c"]
        for r in spark.read.parquet(table).select("bucket", "c").collect()
    }
    assert got2 == hist(emb)

    # training distribution: the labeled fit slice is a subset of the
    # full corpus, so drift is small and NOT stale
    verdict = margin_drift(spark, models, table)
    assert verdict["n_fit"] > 0 and verdict["n_observed"] == emb.count()
    assert not verdict["stale"], verdict

    # shifted distribution (every feature perturbed): margins move,
    # TVD crosses the recalibration trigger, stale flips
    shifted = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x + F.lit(2.0).cast("float")
        ).alias("embedding"),
        "label",
    )
    table_s = str(tmp_path / "margins_shifted")
    stream3 = spark.readStream.schema(_EMB_SCHEMA).parquet(str(in_dir))
    # maintain over the same drip but score SHIFTED features via a
    # batch build into the same-keyed table (the stream plumbing is
    # already pinned above; this pins the detector itself)
    margin_hist(
        shifted.select(_margin_col(w, _probe_feats_col()).alias("margin"))
    ).write.parquet(table_s)
    del stream3
    verdict_s = margin_drift(spark, models, table_s)
    assert verdict_s["tvd"] > MARGIN_TVD_RECALIBRATE
    assert verdict_s["stale"], verdict_s

    # empty side fails loud
    empty = str(tmp_path / "empty_hist")
    spark.createDataFrame([], "bucket long, c long").write.parquet(empty)
    with pytest.raises(ValueError, match="empty histogram"):
        margin_drift(spark, models, empty)
