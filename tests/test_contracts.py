"""Model contract enforcement: dbt's `contract: {enforced: true}` as a
build gate — schema checked pre-write from Catalyst analysis (no data
read), not_null verified in one aggregate pass when opted in."""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.contracts import ContractError, normalize_type
from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.runner import materialize


def _project(tmp_path, model_sql: str, schema_yml: str):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text("name: contractdemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed.parquet\n"
    )
    (proj / "models" / "con_model.sql").write_text(model_sql)
    (proj / "models" / "schema.yml").write_text(schema_yml)
    return proj


def _write_feed(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "id long, label string, v double")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/feed.parquet")


GOOD_SQL = "select id, label, v from {{ source('raw', 'feed') }}\n"

SCHEMA_YML = """
models:
- name: con_model
  description: contracted model
  config:
    contract:
      enforced: true
  columns:
  - name: id
    data_type: bigint
    constraints:
    - type: not_null
  - name: label
    data_type: varchar(256)
  - name: v
    data_type: double
"""


def test_contract_pass_and_yaml_load(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "a", 1.0)])
    proj = _project(tmp_path, GOOD_SQL, SCHEMA_YML)
    manifest = load_project(proj)
    node = manifest.models["con_model"]
    assert node.contract and len(node.columns) == 3
    assert node.description == "contracted model"
    r = materialize(spark, manifest, count_rows=True)
    assert [x for x in r.results if x.name == "con_model"][0].rows == 1


def test_contract_type_mismatch_fails_before_write(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "a", 1.0)])
    # v declared double, model casts to string
    sql = "select id, label, cast(v as string) as v from {{ source('raw', 'feed') }}\n"
    proj = _project(tmp_path, sql, SCHEMA_YML)
    with pytest.raises(ContractError, match="column 'v'"):
        materialize(spark, load_project(proj))


def test_contract_missing_and_undeclared_columns(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "a", 1.0)])
    sql = "select id, label, v, 1 as extra from {{ source('raw', 'feed') }}\n"
    proj = _project(tmp_path, sql, SCHEMA_YML)
    with pytest.raises(ContractError, match="'extra' is not declared"):
        materialize(spark, load_project(proj))
    sql2 = "select id, label from {{ source('raw', 'feed') }}\n"
    proj2 = _project(tmp_path, sql2, SCHEMA_YML)
    with pytest.raises(ContractError, match="'v' .* missing from model output"):
        materialize(spark, load_project(proj2))


def test_contract_not_null_data_check(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "a", 1.0), (None, "b", 2.0)])
    sql = (
        "{{ config(contract_data_checks=true) }}\n"
        "select id, label, v from {{ source('raw', 'feed') }}\n"
    )
    proj = _project(tmp_path, sql, SCHEMA_YML)
    with pytest.raises(ContractError, match="not_null .* id: 1 null"):
        materialize(spark, load_project(proj))


def test_contract_enforced_on_incremental(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "a", 1.0)])
    sql = (
        "{{ config(materialized='incremental', incremental_strategy='append') }}\n"
        "select id, label, cast(v as string) as v from {{ source('raw', 'feed') }}\n"
    )
    proj = _project(tmp_path, sql, SCHEMA_YML)
    with pytest.raises(ContractError, match="column 'v'"):
        materialize(spark, load_project(proj), warehouse_dir=str(tmp_path / "wh"))


def test_normalize_type_spellings():
    assert normalize_type("varchar(256)") == "string"
    assert normalize_type("TEXT") == "string"
    assert normalize_type("integer") == "int"
    assert normalize_type("numeric(18, 3)") == "decimal(18,3)"
    assert normalize_type("decimal") == "decimal(10,0)"
    assert normalize_type("double precision") == "double"
    assert normalize_type("array<int>") == "array<int>"
