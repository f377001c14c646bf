"""dbt python models: `def model(dbt, session)` files under models/,
ref/source resolution, static config/dep extraction, materialization and
contract enforcement through the same runner paths as SQL models."""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.contracts import ContractError
from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.runner import materialize


PY_MODEL = '''
from pyspark.sql import functions as F

def model(dbt, session):
    dbt.config(materialized="table", tags=['py'])
    staged = dbt.ref("stg_feed")
    top_n = dbt.config.get("top_n", 2)
    return (
        staged.groupBy("label")
        .agg(F.sum("v").alias("total"))
        .orderBy(F.desc("total"))
        .limit(top_n)
    )
'''

STG_SQL = "select id, label, v from {{ source('raw', 'feed') }}\n"


def _project(tmp_path, py_body=PY_MODEL, schema_yml=None):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text("name: pydemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed.parquet\n"
    )
    (proj / "models" / "stg_feed.sql").write_text(STG_SQL)
    (proj / "models" / "py_top.py").write_text(py_body)
    if schema_yml:
        (proj / "models" / "schema.yml").write_text(schema_yml)
    return proj


def _write_feed(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 30.0), (4, "c", 0.5)],
        "id long, label string, v double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/feed.parquet")


def test_python_model_parses_and_runs(spark, tmp_path):
    _write_feed(spark, tmp_path)
    proj = _project(tmp_path)
    manifest = load_project(proj)
    node = manifest.models["py_top"]
    assert node.language == "python"
    assert node.materialized == "table"  # from dbt.config in the file
    assert node.depends_on == ["stg_feed"]  # static dbt.ref extraction
    assert node.tags == ["py"]
    # topo order puts the SQL parent first
    order = manifest.topo_sort()
    assert order.index("stg_feed") < order.index("py_top")

    r = materialize(spark, manifest, warehouse_dir=str(tmp_path / "wh"), count_rows=True)
    res = [x for x in r.results if x.name == "py_top"][0]
    assert res.materialized == "table" and res.rows == 2
    got = {r.label: r.total for r in spark.table("py_top").collect()}
    assert got == {"b": 30.0, "a": 3.0}


def test_python_model_source_and_select(spark, tmp_path):
    body = """
def model(dbt, session):
    dbt.config(materialized="view")
    return dbt.source("raw", "feed").where("v > 1.0")
"""
    _write_feed(spark, tmp_path)
    proj = _project(tmp_path, py_body=body)
    manifest = load_project(proj)
    assert manifest.models["py_top"].depends_on == ["raw.feed"]
    # select only the python model: the SQL parent registers lazily
    materialize(spark, manifest, select=["py_top"])
    assert spark.table("py_top").count() == 2


def test_python_model_contract_enforced(spark, tmp_path):
    schema = """
models:
- name: py_top
  config:
    contract:
      enforced: true
  columns:
  - name: label
    data_type: string
  - name: total
    data_type: bigint
"""
    _write_feed(spark, tmp_path)
    proj = _project(tmp_path, schema_yml=schema)
    with pytest.raises(ContractError, match="column 'total'"):
        materialize(spark, load_project(proj), warehouse_dir=str(tmp_path / "wh"))


def test_python_model_must_return_dataframe(spark, tmp_path):
    body = "def model(dbt, session):\n    return 42\n"
    _write_feed(spark, tmp_path)
    proj = _project(tmp_path, py_body=body)
    with pytest.raises(TypeError, match="must return a DataFrame"):
        materialize(spark, load_project(proj), warehouse_dir=str(tmp_path / "wh"))


def test_python_incremental_model(spark, tmp_path):
    """Python incremental: dbt.is_incremental branches, prior state read
    via spark.table(dbt.this), merge strategy upserts."""
    body = '''
def model(dbt, session):
    dbt.config(materialized="incremental", incremental_strategy="merge", unique_key="id")
    feed = dbt.source("raw", "feed")
    if dbt.is_incremental:
        prev_max = session.table(dbt.this).agg({"v": "max"}).first()[0]
        feed = feed.where(feed.v >= prev_max)
    return feed.select("id", "label", "v")
'''
    _write_feed(spark, tmp_path)
    proj = tmp_path / "proj2"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: pyinc\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed.parquet\n"
    )
    (proj / "models" / "py_inc.py").write_text(body)
    from dbt_osmosis_spark.project import load_project

    wh = str(tmp_path / "wh")
    manifest = load_project(proj)
    assert manifest.models["py_inc"].materialized == "incremental"
    r1 = materialize(spark, manifest, warehouse_dir=wh, count_rows=True)
    inc = [x for x in r1.results if x.name == "py_inc"][0]
    assert inc.materialized == "incremental(full build)" and inc.rows == 4

    # update one row's v (id=3 -> 35.0), add id=5; incremental run filters
    # to v >= prior max (30.0) and merges
    spark.createDataFrame(
        [(3, "b", 35.0), (5, "d", 50.0), (1, "a", 1.0)],
        "id long, label string, v double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/feed.parquet")
    r2 = materialize(spark, load_project(proj), warehouse_dir=wh, count_rows=True)
    inc2 = [x for x in r2.results if x.name == "py_inc"][0]
    assert inc2.materialized == "incremental(merge)"
    got = {r.id: r.v for r in spark.table("py_inc").collect()}
    # id=1 old value retained (below watermark, not re-read), 3 upserted, 5 new
    assert got == {1: 1.0, 2: 2.0, 3: 35.0, 4: 0.5, 5: 50.0}
