"""Corpus-LM family (plans/lm_queries.py) + repetition stats boundary
semantics on hand-built corpora (the sf oracles cover the bulk path;
these pin the short-document edges)."""

from __future__ import annotations

import pytest

from in_stream_processing_course_spark.plans.lm_queries import (
    lm_doc_scores,
    lm_oov_rate,
)
from in_stream_processing_course_spark.plans.text_queries import (
    text_repetition_stats,
)

DOCS = [
    # doc 0: empty -> no tokens at all
    (0, "", "en", "web", 0),
    # doc 1: single token -> no bigrams, but one OOV-checkable token
    (1, "alpha", "en", "web", 5),
    # doc 2: pure repetition -> dup fracs 1.0, top share 1.0
    (2, "spam spam spam spam spam spam", "en", "web", 29),
    # doc 3: all-distinct tokens (appearing >=5 times across corpus? no
    # -> every token OOV under the >=5 threshold)
    (3, "one two three four five six", "en", "web", 27),
    # docs 4-8: make 'spam' pass the vocabulary threshold
    *[(4 + i, "spam ham", "en", "web", 8) for i in range(5)],
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lmcorpus")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_doc_scores_drop_sub_bigram_docs(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in lm_doc_scores(spark, corpus_dir).collect()}
    # docs 0 and 1 have no bigram -> absent; everything else scored
    assert 0 not in rows and 1 not in rows
    assert rows[2]["n_bigrams"] == 5
    # 'spam spam' dominates doc 2's bigrams -> highest mean probability
    assert rows[2]["mean_p"] == max(r["mean_p"] for r in rows.values())


def test_oov_rate_thresholded_vocab(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in lm_oov_rate(spark, corpus_dir).collect()}
    assert 0 not in rows  # no tokens -> no row
    # corpus counts: spam=11 (in vocab), ham=5 (in vocab), others < 5
    assert rows[1]["n_oov"] == 1 and rows[1]["oov_rate"] == 1.0
    assert rows[3]["n_oov"] == 6 and rows[3]["oov_rate"] == 1.0
    assert rows[4]["n_oov"] == 0 and rows[4]["oov_rate"] == 0.0
    assert rows[2]["oov_rate"] == 0.0


def test_repetition_stats_boundaries(spark, corpus_dir):
    rows = {
        r["doc_id"]: r
        for r in text_repetition_stats(spark, corpus_dir).collect()
    }
    assert 0 not in rows  # tokenless docs drop (no top term)
    # single-token doc: no n-grams -> NULL fracs, top share 1.0
    r1 = rows[1]
    assert r1["dup_2gram_frac"] is None and r1["dup_3gram_frac"] is None
    assert r1["top_word_share"] == 1.0 and not r1["pass_repetition"]
    # pure repetition: every bigram/trigram a duplicate
    r2 = rows[2]
    assert r2["dup_2gram_frac"] == 0.8  # 5 bigrams, 1 distinct
    assert r2["dup_3gram_frac"] == 0.75  # 4 trigrams, 1 distinct
    assert r2["top_word_share"] == 1.0 and not r2["pass_repetition"]
    # all-distinct doc: zero duplication, top share 1/6 > 0.1 cap
    r3 = rows[3]
    assert r3["dup_2gram_frac"] == 0.0 and r3["dup_3gram_frac"] == 0.0
    assert not r3["pass_repetition"]


def test_repetition_gate_streams_through_quarantine(spark, tmp_path):
    """The repetition signals are pure per-row expressions, so the same
    repetition_stat_cols projection that feeds the batch query gates a
    STREAM: spammy docs route to the dead-letter quarantine, clean docs
    to main, nothing lost."""
    from in_stream_processing_course_spark.operators.quality_checks import (
        Check,
    )
    from in_stream_processing_course_spark.plans.text_queries import (
        with_repetition_stats,
    )
    from in_stream_processing_course_spark.streaming.quarantine import (
        QuarantineSink,
    )
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_foreach_batch,
    )
    from tests.conftest import drip_json_chunks

    in_dir = drip_json_chunks(
        tmp_path,
        [
            [
                {"doc_id": 1, "text": "buy now " * 40},
                {"doc_id": 2, "text": "the quick brown fox jumps over a "
                                      "lazy dog while rain falls softly"},
            ],
            [
                {"doc_id": 3, "text": "spam " * 50},
                {"doc_id": 4, "text": "numbers grow data moves charts "
                                      "shift people read words change"},
            ],
        ],
    )
    stream = with_repetition_stats(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(in_dir))
    )
    sink = QuarantineSink(
        str(tmp_path / "main"),
        str(tmp_path / "dlq"),
        [Check("repetition", "accepted", "pass_repetition", values=(True,))],
    )
    run_stream_foreach_batch(stream, sink, output_mode="append")
    main_ids = {
        r["doc_id"]
        for r in QuarantineSink.read(spark, str(tmp_path / "main")).collect()
    }
    dlq = {
        r["doc_id"]: r["failed_checks"]
        for r in QuarantineSink.read(spark, str(tmp_path / "dlq")).collect()
    }
    assert main_ids == {2, 4}
    assert dlq == {1: "repetition", 3: "repetition"}


def test_stream_scoring_matches_batch_self_score(spark, corpus_dir, tmp_path):
    """Stream-static LM gate (streaming/lm_gate.py): scoring the
    training corpus as a STREAM against the persisted model reproduces
    the batch self-scoring query row for row (complete mode mirrors
    the final table)."""
    from in_stream_processing_course_spark.streaming.lm_gate import (
        save_lm_model,
        score_document_stream,
    )
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_to_memory,
    )

    model_path = str(tmp_path / "lm")
    save_lm_model(spark, corpus_dir, model_path)

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .parquet(corpus_dir + "/documents.parquet")
        .select("doc_id", "text")
    )
    got = {
        (r["doc_id"], r["n_bigrams"], r["mean_p"])
        for r in run_stream_to_memory(
            score_document_stream(stream, spark, model_path),
            output_mode="complete",
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect()
    }
    want = {
        (r["doc_id"], r["n_bigrams"], r["mean_p"])
        for r in lm_doc_scores(spark, corpus_dir).collect()
    }
    assert got == want and got


def test_stream_scoring_smooths_unseen_content(spark, corpus_dir, tmp_path):
    """A streamed document whose bigrams AND context words the model
    never saw gets the pure add-1/2 fallback p = 1/V per bigram — the
    out-of-model branch the batch self-scoring query cannot reach."""
    from in_stream_processing_course_spark.streaming.lm_gate import (
        save_lm_model,
        score_document_stream,
    )

    model_path = str(tmp_path / "lm")
    save_lm_model(spark, corpus_dir, model_path)
    v = spark.read.parquet(model_path + "/meta").head()["v"]

    novel = spark.createDataFrame(
        [(99, "zz yy xx ww")], "doc_id long, text string"
    )
    rows = score_document_stream(novel, spark, model_path).collect()
    assert len(rows) == 1
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["mean_p"] == round(1.0 / v, 6)
