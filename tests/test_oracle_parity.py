"""Mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB on row count, columns, and value hash.
Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import pytest

from in_stream_processing_course_spark.plans.registry import ORACLES, QUERIES
from tests.oracle_compare import compare_query

ORACLE_CASES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, QUERIES[name], ORACLES[name], sf_dir)


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
