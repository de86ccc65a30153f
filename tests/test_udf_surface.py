"""SURVEY §2.8 UDF/UDAF/UDTF surface: the engine policy is native
Column algebra in every hot path, but the full Python extension
surface must WORK for operators the policy can't express. Each API is
exercised against its native twin so the tests pin both the API shape
and the equivalence:

- UDTF (table function): a chunker emitting one row per 64-token
  window, lateral-joined per document == the native
  generate-explode-slice ``text_chunks`` plan;
- pandas grouped-agg UDAF: per-type value aggregate == native
  ``groupBy().agg()``;
- Arrow-batched scalar pandas UDF: vectorized token count == the
  native ``size(split())`` column.

(The reference's "UDFs" are Scala closures — SURVEY §2.8; this is
the PySpark equivalent surface, kept out of the benched paths.)"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from in_stream_processing_course_spark.functions import text as tx
from in_stream_processing_course_spark.plans.pipeline_queries import (
    _CHUNK_OVERLAP,
    _CHUNK_STRIDE,
    _CHUNK_TOKENS,
    text_chunks,
)


@udtf(returnType="chunk_id: long, n_chunk_tokens: long, chunk_text: string")
class ChunkUDTF:
    """Row-per-chunk table function — the imperative twin of the
    native chunker."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        toks = [t for t in (text or "").lower().split() if t]
        stride, width = _CHUNK_STRIDE, _CHUNK_TOKENS
        n_chunks = max(1, -(-(len(toks) - _CHUNK_OVERLAP) // stride))
        for ci in range(n_chunks):
            window = toks[ci * stride : ci * stride + width]
            yield ci, len(window), " ".join(window)


def test_udtf_chunker_matches_native_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spark.udtf.register("chunk_udtf", ChunkUDTF)
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_text
        FROM udtf_docs d, LATERAL chunk_udtf(d.text) c
        """
    )
    native = text_chunks(spark, sf_dir)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in native.collect()
    )


def test_pandas_grouped_agg_udaf_matches_native(spark, sf_dir):
    @pandas_udf("double")
    def value_spread(v: pd.Series) -> float:
        return float(v.max() - v.min())

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r["spread"]
        for r in ev.groupBy("event_type")
        .agg(value_spread("value").alias("spread"))
        .collect()
    }
    want = {
        r["event_type"]: r["spread"]
        for r in ev.groupBy("event_type")
        .agg((F.max("value") - F.min("value")).alias("spread"))
        .collect()
    }
    assert got == want and len(got) >= 3


def test_scalar_pandas_udf_matches_native_column(spark, sf_dir):
    @pandas_udf("long")
    def py_token_count(text: pd.Series) -> pd.Series:
        return text.str.split().map(len).astype("int64")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    both = docs.select(
        "doc_id",
        py_token_count("text").alias("py_n"),
        tx.token_count_col(F.col("text")).alias("native_n"),
    )
    assert both.where(F.col("py_n") != F.col("native_n")).count() == 0
