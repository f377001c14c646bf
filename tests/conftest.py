from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dbt_osmosis_spark.session import get_spark

    spark = get_spark(app_name="tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from dbt_osmosis_spark.oracle import duckdb_connect

    con = duckdb_connect(sf_dir)
    yield con
    con.close()
