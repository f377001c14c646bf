from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "ntz_full: full-registry sweep under the driver-like NTZ session "
        "(opt-in: `pytest -m ntz_full`; the default run covers only the "
        "next 50-query driver window — VERDICT r9 item 6)",
    )


def pytest_collection_modifyitems(config, items):
    # ntz_full is a cadence lane, not a per-commit one: ~244 extra oracle
    # parity checks would roughly double the suite. Deselect unless the
    # marker was explicitly requested.
    if "ntz_full" in (config.option.markexpr or ""):
        return
    skip = pytest.mark.skip(reason="opt-in cadence lane: run with -m ntz_full")
    for item in items:
        if "ntz_full" in item.keywords:
            item.add_marker(skip)


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
