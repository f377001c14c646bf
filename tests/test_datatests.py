"""Executable data tests (dbt test analog) — built-in tests as Spark
assertion queries returning violation counts."""

from __future__ import annotations

import shutil

import pytest

from dbt_osmosis_spark.cli import main
from dbt_osmosis_spark.datatests import run_model_tests, run_test

DEMO = "/root/repo/demo_spark"


@pytest.fixture(scope="module")
def demo(spark, tmp_path_factory):
    from dbt_osmosis_spark.project import load_project
    from dbt_osmosis_spark.runner import materialize

    proj = tmp_path_factory.mktemp("dt") / "proj"
    shutil.copytree(DEMO, proj)
    manifest = load_project(proj)
    materialize(spark, manifest, warehouse_dir=str(proj / "wh"))
    return str(proj)


def test_builtin_tests_pass_and_fail(spark, demo):
    assert run_test(spark, "customers", "customer_id", "unique").passed
    assert run_test(spark, "customers", "customer_id", "not_null").passed
    # every stg_orders.status value is in the accepted set
    ok = run_test(
        spark, "stg_orders", "status", "accepted_values",
        {"values": ["placed", "shipped", "completed", "return_pending", "returned"]},
    )
    assert ok.passed
    # shrink the set -> violations with a sample
    bad = run_test(spark, "stg_orders", "status", "accepted_values", {"values": ["placed"]})
    assert not bad.passed and bad.violations > 0 and bad.sample
    # referential integrity: every order's customer exists
    rel = run_test(
        spark, "stg_orders", "customer_id", "relationships",
        {"to": "stg_customers", "field": "customer_id"},
    )
    assert rel.passed


def test_yaml_declared_tests_run(spark, demo):
    entry = {
        "name": "customers",
        "columns": [
            {"name": "customer_id", "tests": ["unique", "not_null"]},
            {
                "name": "number_of_orders",
                "data_tests": [{"accepted_values": {"values": list(range(0, 100))}}],
            },
        ],
    }
    results = run_model_tests(spark, "customers", entry)
    assert len(results) == 3
    assert all(r.passed for r in results)


def test_cli_test_command(spark, demo, tmp_path, capsys):
    # declare a test in the sidecar yaml, then run the CLI `test` command
    (tmp_path / "wh").mkdir(exist_ok=True)
    import yaml as pyyaml

    doc = {
        "version": 2,
        "models": [
            {
                "name": "customers",
                "columns": [{"name": "customer_id", "tests": ["unique", "not_null"]}],
            }
        ],
    }
    import pathlib

    (pathlib.Path(demo) / "models/marts/customers.yml").write_text(pyyaml.safe_dump(doc))
    rc = main(["--project-dir", demo, "--warehouse-dir", str(tmp_path / "wh"), "test"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "2/2 tests passed" in out


def test_unit_tests_mocked_inputs(spark, demo):
    """dbt-style unit tests: model runs against inline mocked refs, output
    compared order-insensitively."""
    from dbt_osmosis_spark.project import load_project
    from dbt_osmosis_spark.unittests import run_unit_tests_from_doc

    manifest = load_project(demo)
    doc = {
        "unit_tests": [
            {
                "name": "stg_payments_dollars",
                "model": "stg_payments",
                "given": [
                    {
                        "input": "ref('raw_payments')",
                        "rows": [
                            {"id": 1, "order_id": 10, "payment_method": "coupon", "amount": 150},
                            {"id": 2, "order_id": 11, "payment_method": "cash", "amount": 50},
                        ],
                    }
                ],
                "expect": {
                    "rows": [
                        {"payment_id": 1, "amount": 1.5},
                        {"payment_id": 2, "amount": 0.5},
                    ]
                },
            },
            {
                "name": "deliberately_wrong",
                "model": "stg_payments",
                "given": [
                    {
                        "input": "ref('raw_payments')",
                        "rows": [
                            {"id": 1, "order_id": 10, "payment_method": "coupon", "amount": 150},
                        ],
                    }
                ],
                "expect": {"rows": [{"payment_id": 1, "amount": 9999.0}]},
            },
        ]
    }
    results = run_unit_tests_from_doc(spark, manifest, doc)
    assert results[0].passed, results[0]
    assert not results[1].passed and results[1].missing


def test_store_failures_persists_violating_rows(spark, tmp_path):
    """dbt store_failures: a failing test writes its full violating-row
    set as a queryable parquet artifact."""
    from dbt_osmosis_spark.datatests import run_test

    spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "id long, s string"
    ).createOrReplaceTempView("sf_rel")
    out = str(tmp_path / "failures")
    r = run_test(spark, "sf_rel", "id", "unique", store_failures_dir=out)
    assert not r.passed and r.stored_at is not None
    stored = spark.read.parquet(r.stored_at)
    assert stored.collect()[0].id == 1  # the duplicated key, with its count
    # passing tests store nothing
    r2 = run_test(spark, "sf_rel", "s", "unique", store_failures_dir=out)
    assert r2.passed and r2.stored_at is None


def test_severity_warn_and_thresholds(spark):
    """dbt severity contract: warn-severity violations don't fail; error_if
    thresholds gate failure; warn_if marks warnings."""
    from dbt_osmosis_spark.datatests import run_test

    spark.createDataFrame(
        [(1,), (1,), (2,)], "k long"
    ).createOrReplaceTempView("sev_demo")
    r = run_test(spark, "sev_demo", "k", "unique", {"severity": "warn"})
    assert r.violations == 1 and r.status == "warn" and r.passed
    r = run_test(spark, "sev_demo", "k", "unique", {"error_if": ">5"})
    assert r.status == "warn" and r.passed  # below error threshold → warn
    r = run_test(spark, "sev_demo", "k", "unique", {"error_if": ">0"})
    assert r.status == "fail" and not r.passed
    r = run_test(spark, "sev_demo", "k", "unique", {"error_if": ">5", "warn_if": ">5"})
    assert r.status == "pass"


def test_malformed_threshold_errors_one_test_only(spark):
    """A malformed warn_if/error_if (ADVICE r2) must error THAT test with a
    named config message — not raise mid-run and abort the command."""
    spark.createDataFrame([(1,), (1,)], "k long").createOrReplaceTempView("thr_demo")
    r = run_test(spark, "thr_demo", "k", "unique", {"error_if": ">=1.5"})
    assert r.status == "error" and not r.passed
    assert ">=1.5" in r.message and "integer" in r.message
    r2 = run_test(spark, "thr_demo", "k", "unique", {"severity": "warn", "warn_if": ">ten"})
    assert r2.status == "error" and ">ten" in r2.message
    # well-formed configs are unaffected
    assert run_test(spark, "thr_demo", "k", "unique", {"error_if": ">5"}).passed
