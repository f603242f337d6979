"""Shared fixtures: one SparkSession per test run, testdata paths."""

from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from agol_pandas_spark.session import get_spark

    s = get_spark(app_name="agol_pandas_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_CORRECTNESS


@pytest.fixture(scope="session")
def catalog(spark, sf_dir):
    from agol_pandas_spark.catalog import Catalog

    return Catalog(spark, sf_dir)
