"""Multibyte poison tests for the text family (r13, VERDICT r12
next-round #4 — the pHash ascii_guard discipline extended to
plans/text_queries.py + functions/text.py).

The audit this round probed every byte-vs-char assumption class
engine-vs-engine (Spark/Java vs DuckDB/utf8proc) on accented Latin,
CJK, astral-plane emoji, Unicode whitespace, and combining marks:

- char split + ascii() fold (document_fingerprints) — AGREES
  (both engines split characters, not bytes, and ascii() returns the
  code point; surrogate-pair emoji included);
- length()/substr()/substring() — AGREES (both char-indexed);
- '\\s+' tokenization — AGREES (Java regex and RE2 are both
  ASCII-\\s by default, so exotic whitespace tokenizes identically);
- regex char classes ([A-Za-z0-9_], punct ratio) — AGREES;
- lower() — DIVERGES on exactly the two Unicode SpecialCasing.txt
  lowercase rules: U+0130 İ (Java: full mapping i+U+0307; utf8proc:
  simple mapping i) and U+03A3 Σ (Java applies the conditional
  Final_Sigma rule at word end; utf8proc always σ).

So the agreeing classes are pinned by a real cross-engine comparison
on a poison corpus (not just observed on ASCII fixtures), and the one
divergent class is guarded loudly in every text-family oracle via
plans.text_queries.sql_lower_guarded.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

# non-ASCII rows on which BOTH engines must agree (no İ / Σ)
POISON_AGREE = [
    "héllo wörld ß straße of the and",
    "中文文本 没有空格的长句子 the of",
    "emoji 🙂🚀 the test of a to",
    "nbsp and em-space the a",
    "áccent combining the of and",
]
# rows containing the two divergent SpecialCasing characters
POISON_DIVERGENT = ["İstanbul the of", "ΣΟΦΟΣ ΑΣ the of"]


def _write_documents(tmp_path, texts) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path)
    tbl = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["xx"] * len(texts),
            "source": ["poison"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def _compare(spark, query_fn, oracle_sql, sf_dir) -> None:
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from oracle_compare import canonical_hash

    sdf = query_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert canonical_hash(sdf.columns, srows) == canonical_hash(ocols, orows)


def test_fingerprint_oracle_agrees_on_multibyte(spark, tmp_path):
    """Rabin-Karp char-split + ascii() fold: both engines split
    CHARACTERS (not bytes) and return code points — the fingerprint
    hash must match on CJK / emoji / combining-mark text, proving the
    oracle needs no ascii_guard (unlike pHash, whose replay is
    byte-indexed)."""
    from in_stream_processing_course_spark.plans.text_queries import (
        ORACLE_FINGERPRINTS,
        document_fingerprints,
    )

    sf_dir = _write_documents(tmp_path, POISON_AGREE)
    _compare(spark, document_fingerprints, ORACLE_FINGERPRINTS, sf_dir)


def test_text_metrics_oracle_agrees_on_multibyte(spark, tmp_path):
    """length / '\\s+' tokenization / regex char classes / stopword
    matching / quality arithmetic all hash-match cross-engine on the
    poison corpus — the byte-vs-char classes the r12 audit asked
    about are multibyte-CORRECT, not merely ASCII-lucky."""
    from in_stream_processing_course_spark.plans.text_queries import (
        ORACLE_TEXT_METRICS,
        text_metrics,
    )

    sf_dir = _write_documents(tmp_path, POISON_AGREE)
    _compare(spark, text_metrics, ORACLE_TEXT_METRICS, sf_dir)


def test_trigram_profile_agrees_on_multibyte(spark, tmp_path):
    """Char-n-gram substring windows (the lang-confusion trigram
    profile) are char-indexed on both engines; multibyte text must
    produce identical trigram multisets."""
    from in_stream_processing_course_spark.plans.text_queries import (
        ORACLE_LANG_NGRAM_CONFUSION,
        text_lang_ngram_confusion,
    )

    sf_dir = _write_documents(tmp_path, POISON_AGREE)
    _compare(
        spark,
        text_lang_ngram_confusion,
        ORACLE_LANG_NGRAM_CONFUSION,
        sf_dir,
    )


def test_lower_divergence_is_exactly_the_guarded_set(spark):
    """Pin the engine behavior the guard encodes: Java lower() applies
    the two SpecialCasing rules (İ -> i+combining dot, word-final
    Σ -> ς), utf8proc applies simple mappings — and on the agreeing
    poison rows the two engines are identical. If a Spark or DuckDB
    upgrade changes either side, this fails before any oracle does."""
    import duckdb

    rows = POISON_AGREE + POISON_DIVERGENT
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "i int, t string"
    )
    got = {
        r["i"]: r["l"]
        for r in df.select("i", F.lower("t").alias("l")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(rows):
        duck = con.execute("SELECT lower(?)", [t]).fetchone()[0]
        if t in POISON_AGREE:
            assert got[i] == duck, (t, got[i], duck)
        else:
            assert got[i] != duck, f"divergence disappeared for {t!r}"
    assert got[len(POISON_AGREE)].startswith("i̇")  # İ full mapping
    assert "ας " in got[len(POISON_AGREE) + 1]  # word-final Σ -> ς


@pytest.mark.parametrize("poison", POISON_DIVERGENT)
def test_text_oracle_lower_guard_raises_on_specialcasing(
    tmp_path, poison
):
    """Every text-family oracle routes lower() through
    sql_lower_guarded: a fixture row containing İ or Σ must error()
    with the NAMED SpecialCasing message instead of silently
    hash-diverging (two rows minimum, matching the pHash guard test's
    degenerate-plan caveat)."""
    import duckdb

    from in_stream_processing_course_spark.plans.text_queries import (
        ORACLE_TEXT_METRICS,
    )

    sf_dir = _write_documents(tmp_path, ["plain ascii row", poison])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    with pytest.raises(duckdb.Error, match="SpecialCasing"):
        con.execute(ORACLE_TEXT_METRICS).fetchall()
