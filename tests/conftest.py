from __future__ import annotations

import os

import pytest

from es_indexer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("es-indexer-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
