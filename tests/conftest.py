from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_iceberg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark()
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")


@pytest.fixture()
def catalog(spark, warehouse):
    from go_iceberg_spark.catalog.catalog import FilesystemCatalog

    return FilesystemCatalog(spark, warehouse)
