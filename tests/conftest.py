from __future__ import annotations

import pytest

from in_stream_processing_course_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("isp-course-spark-tests", shuffle_partitions="8")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
