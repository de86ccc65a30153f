"""Trigram-profile language ID (text_lang_ngram_confusion): the
char-ngram helper's short-text guard, and a separable mini-corpus
where the out-of-place measure must recover every label exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from in_stream_processing_course_spark.functions.text import char_ngrams_col
from in_stream_processing_course_spark.plans.text_queries import (
    text_lang_ngram_confusion,
)


def test_char_ngrams_short_text_guard(spark):
    df = spark.createDataFrame(
        [("",), ("ab",), ("abc",), ("abcd",)], "t string"
    )
    got = {
        r["t"]: r["g"]
        for r in df.select(
            "t", char_ngrams_col(F.col("t")).alias("g")
        ).collect()
    }
    # sequence(1, 0) counts DOWN in Spark — the guard must keep short
    # texts at [] instead of walking phantom indices
    assert got == {
        "": [],
        "ab": [],
        "abc": ["abc"],
        "abcd": ["abc", "bcd"],
    }


def test_ngram_lid_recovers_separable_corpus(spark, tmp_path):
    """Two languages with disjoint trigram inventories: the confusion
    matrix must be perfectly diagonal."""
    rows = []
    for i in range(6):
        rows.append((i, "alpha alpine albatross " * (i + 1), "aa", "s", 1))
    for i in range(6):
        rows.append(
            (100 + i, "zebra zigzag zealot " * (i + 1), "zz", "s", 1)
        )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["lang"], r["lang_pred"]): r["n_docs"]
        for r in text_lang_ngram_confusion(spark, str(tmp_path)).collect()
    }
    assert got == {("aa", "aa"): 6, ("zz", "zz"): 6}
