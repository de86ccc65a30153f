"""Streaming DSIR selection gate (streaming/dsir_gate.py): gating the
training corpus as a dripped stream reproduces the batch
``dsir_importance_weights`` verdicts row for row (stream == batch), a
checkpoint restart with more data converges exactly (no re-screening,
no double upserts), out-of-corpus arrivals degrade to the smoothing
floor instead of dropping, and the empty-target precondition fails
loud in BOTH the trainer and the batch query (ADVICE r8)."""

from __future__ import annotations

import json
import time

import pytest

from in_stream_processing_course_spark.streaming.dsir_gate import (
    DsirGate,
    gate_document_stream,
    save_dsir_models,
    weigh_documents,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

# two clearly separated "domains": the en slice is the DSIR seed
_CHUNK_A = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "the quick brown dog runs over the lazy fox", "en", "web"),
    (3, "uno dos tres cuatro cinco seis siete ocho", "xx", "web"),
    (4, "nueve diez once doce trece catorce quince", "xx", "web"),
]
_CHUNK_B = [
    (5, "the quick fox and the lazy dog again", "en", "wiki"),
    (6, "uno dos tres and the quick fox", "xx", "wiki"),
]


def _rows(chunk):
    return [
        {
            "doc_id": d,
            "text": t,
            "lang": lang,
            "source": src,
            "n_chars": len(t),
        }
        for d, t, lang, src in chunk
    ]


def _write_chunk(in_dir, name, chunk) -> None:
    with open(in_dir / name, "w") as f:
        for row in _rows(chunk):
            f.write(json.dumps(row) + "\n")


def _verdicts(spark, path) -> dict:
    return {
        r["doc_id"]: (
            r["n_bigrams"],
            r["mean_p_target"],
            r["mean_p_raw"],
            r["weight"],
            r["selected"],
        )
        for r in spark.read.parquet(path).collect()
    }


def test_dsir_gate_matches_batch_and_restarts(spark, tmp_path):
    corpus = spark.createDataFrame(
        [tuple(r.values()) for r in _rows(_CHUNK_A + _CHUNK_B)], _DOC_SCHEMA
    )
    # persist the corpus as a table dir so the BATCH query can score it
    corpus_dir = tmp_path / "corpus"
    corpus.coalesce(1).write.parquet(str(corpus_dir / "documents.parquet"))

    models = str(tmp_path / "models")
    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    save_dsir_models(spark, corpus, models)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_chunk(in_dir, "a.json", _CHUNK_A)

    def run():
        gate = DsirGate(spark, models, verdicts)
        stream = spark.readStream.schema(_DOC_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).json(str(in_dir))
        await_drained(gate_document_stream(stream, gate, ckpt))

    run()
    got = _verdicts(spark, verdicts)
    assert set(got) == {1, 2, 3, 4}

    # restart with MORE data on the SAME checkpoint: only the new
    # chunk screens; committed verdicts stay put (keyed upsert)
    time.sleep(1.1)
    _write_chunk(in_dir, "b.json", _CHUNK_B)
    run()
    got = _verdicts(spark, verdicts)
    assert set(got) == {1, 2, 3, 4, 5, 6}

    # stream == batch: the registered batch query over the same corpus
    from in_stream_processing_course_spark.plans.lm_queries import (
        dsir_importance_weights,
    )

    want = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["mean_p_target"],
            r["mean_p_raw"],
            r["weight"],
            r["selected"],
        )
        for r in dsir_importance_weights(spark, str(corpus_dir)).collect()
    }
    assert got == want
    # the gate actually separates: the seed domain selects, the other
    # domain does not (all-en or all-xx would make this test vacuous)
    assert {got[d][-1] for d in (1, 2)} == {True}
    assert {got[d][-1] for d in (3, 4)} == {False}


def test_dsir_gate_smooths_unseen_content(spark, tmp_path):
    """An arrival whose bigrams and context words NEITHER model saw
    scores the pure add-half floor under both (p = 1/V per bigram) —
    the LEFT-join branch the batch self-scoring query cannot reach.
    With V_target < V_raw the floor is HIGHER under the target model,
    so a fully-novel document lands weight > 0 (worth knowing: novelty
    alone does not reject — the gate measures target-likeness, and a
    production run pairs it with the lm_gate quality floor)."""
    corpus = spark.createDataFrame(
        [tuple(r.values()) for r in _rows(_CHUNK_A)], _DOC_SCHEMA
    )
    models = str(tmp_path / "models")
    save_dsir_models(spark, corpus, models)
    v_t = spark.read.parquet(f"{models}/target/meta").head()["v"]
    v_r = spark.read.parquet(f"{models}/raw/meta").head()["v"]

    novel = spark.createDataFrame(
        [(99, "zz yy xx ww", "en", "web", 11)], _DOC_SCHEMA
    )
    rows = weigh_documents(novel, spark, models).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_bigrams"] == 3
    assert r["mean_p_target"] == round(1.0 / v_t, 6)
    assert r["mean_p_raw"] == round(1.0 / v_r, 6)
    assert r["selected"] == (r["weight"] > 0)


def test_dsir_empty_target_fails_loud(spark, tmp_path):
    """Both the trainer and the batch query refuse an empty seed slice
    with a clear message instead of an ANSI divide-by-zero deep in the
    scoring join (ADVICE r8)."""
    no_en = spark.createDataFrame(
        [tuple(r.values()) for r in _rows(_CHUNK_A) if r["lang"] != "en"],
        _DOC_SCHEMA,
    )
    with pytest.raises(ValueError, match="target domain slice is empty"):
        save_dsir_models(spark, no_en, str(tmp_path / "m"))

    from in_stream_processing_course_spark.plans.lm_queries import (
        dsir_importance_weights,
    )

    corpus_dir = tmp_path / "corpus"
    no_en.coalesce(1).write.parquet(str(corpus_dir / "documents.parquet"))
    with pytest.raises(ValueError, match="target domain slice is empty"):
        dsir_importance_weights(spark, str(corpus_dir))
