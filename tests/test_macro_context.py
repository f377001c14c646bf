"""Compile-time macro context: run_query / execute flag / built-in
dbt_utils namespace (star, surrogate_key, get_column_values, date_spine,
pivot) — the introspective codegen surface dbt macros lean on."""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.compile import JinjaCompiler
from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.runner import materialize


def _project(tmp_path, models: dict[str, str]):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text("name: macroctx\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed.parquet\n"
    )
    for name, sql in models.items():
        (proj / "models" / name).write_text(sql)
    return proj


def _write_feed(spark, tmp_path):
    spark.createDataFrame(
        [(1, "credit", 10.0, "x"), (2, "debit", 20.0, "y"), (3, "credit", 5.0, "z")],
        "id long, method string, amount double, secret string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/feed.parquet")


def test_star_and_surrogate_key(spark, tmp_path):
    _write_feed(spark, tmp_path)
    proj = _project(
        tmp_path,
        {
            "base.sql": "select * from {{ source('raw', 'feed') }}\n",
            "starred.sql": (
                "select {{ dbt_utils.star(ref('base'), except_=['secret']) }},\n"
                "       {{ dbt_utils.surrogate_key(['id', 'method']) }} as sk\n"
                "from {{ ref('base') }}\n"
            ),
        },
    )
    materialize(spark, load_project(proj))
    t = spark.table("starred")
    assert t.columns == ["id", "method", "amount", "sk"]  # secret excluded
    assert t.select("sk").distinct().count() == 3  # unique per (id, method)


def test_run_query_and_get_column_values_drive_dynamic_pivot(spark, tmp_path):
    _write_feed(spark, tmp_path)
    proj = _project(
        tmp_path,
        {
            "base.sql": "select * from {{ source('raw', 'feed') }}\n",
            "pivoted.sql": (
                "{% if execute %}\n"
                "{% set methods = dbt_utils.get_column_values(ref('base'), 'method') %}\n"
                "select {{ dbt_utils.pivot('method', methods, agg='sum', then_value='amount') }}\n"
                "from {{ ref('base') }}\n"
                "{% else %}\n"
                "select 1 as placeholder\n"
                "{% endif %}\n"
            ),
            "maxid.sql": (
                "{% set r = run_query('select max(id) as m from ' ~ ref('base')) %}\n"
                "select {{ r.rows[0].m }} as max_id\n"
            ),
        },
    )
    materialize(spark, load_project(proj))
    piv = spark.table("pivoted").first()
    assert piv.method_credit == 15.0 and piv.method_debit == 20.0
    assert spark.table("maxid").first().max_id == 3


def test_execute_false_without_engine(tmp_path, spark):
    _write_feed(spark, tmp_path)
    proj = _project(
        tmp_path,
        {"base.sql": "select * from {{ source('raw', 'feed') }}\n"},
    )
    manifest = load_project(proj)
    sql = "{% if execute %}select 1 as a{% else %}select 0 as a{% endif %}"
    assert "select 0" in JinjaCompiler(manifest).compile(sql).compiled_sql
    assert "select 1" in JinjaCompiler(manifest, spark=spark).compile(sql).compiled_sql
    with pytest.raises(RuntimeError, match="run_query needs a live engine"):
        JinjaCompiler(manifest).compile("{% set r = run_query('select 1') %}ok")


def test_date_spine_macro(spark, tmp_path):
    _write_feed(spark, tmp_path)
    proj = _project(
        tmp_path,
        {
            "spine.sql": (
                "select date_day from {{ dbt_utils.date_spine('day', '2026-01-01', '2026-01-05') }}\n"
            )
        },
    )
    materialize(spark, load_project(proj))
    assert spark.table("spine").count() == 5
