from __future__ import annotations

import os

import pytest

from olake_spark.session import get_spark

os.environ.setdefault("OLAKE_SPARK_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("olake-tests", cores=os.environ.get("OLAKE_TEST_CORES", "4"))
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "tbl")


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
