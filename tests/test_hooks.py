"""dbt hooks: model pre_hook/post_hook and project on-run-start/end —
arbitrary SQL around builds ({{ this }} resolves in model hooks)."""

from __future__ import annotations

from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.runner import materialize


def _project(tmp_path, model_sql, project_yml="name: hookdemo\n"):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text(project_yml)
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed.parquet\n"
    )
    (proj / "models" / "m.sql").write_text(model_sql)
    return proj


def _write_feed(spark, tmp_path):
    spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/feed.parquet")


def test_model_hooks_run_around_build(spark, tmp_path):
    sql = (
        "{{ config(pre_hook='create or replace temporary view pre_audit as "
        "select 1 as stage, 2 as extra', "
        "post_hook='create or replace temporary view post_audit as "
        "select count(*) as n from {{ this }}') }}\n"
        "select id, v from {{ source('raw', 'feed') }}\n"
    )
    _write_feed(spark, tmp_path)
    materialize(spark, load_project(_project(tmp_path, sql)))
    # pre hook ran (comma inside the quoted hook survived config parsing)
    assert spark.table("pre_audit").first().extra == 2
    # post hook ran AFTER the build: {{ this }} resolved and counted rows
    assert spark.table("post_audit").first().n == 2


def test_project_level_run_hooks(spark, tmp_path):
    yml = (
        "name: hookdemo\n"
        "on-run-start: create or replace temporary view run_started as select 1 as ok\n"
        "on-run-end:\n"
        "- create or replace temporary view run_ended as select count(*) as n from m\n"
    )
    _write_feed(spark, tmp_path)
    manifest = load_project(_project(tmp_path, "select id from {{ source('raw', 'feed') }}\n", yml))
    assert manifest.on_run_start and manifest.on_run_end
    materialize(spark, manifest)
    assert spark.table("run_started").first().ok == 1
    assert spark.table("run_ended").first().n == 2  # end hook sees built models


def test_private_model_access_enforced(spark, tmp_path):
    """dbt groups/access: ref() into a private model from another group
    fails the build; same-group refs pass."""
    import pytest

    proj = tmp_path / "gproj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: govdemo\n")
    (proj / "models" / "core_secret.sql").write_text(
        "{{ config(group='core', access='private') }}\nselect 1 as x\n"
    )
    (proj / "models" / "core_user.sql").write_text(
        "{{ config(group='core') }}\nselect x from {{ ref('core_secret') }}\n"
    )
    (proj / "models" / "outsider.sql").write_text(
        "{{ config(group='marts') }}\nselect x from {{ ref('core_secret') }}\n"
    )
    manifest = load_project(proj)
    assert manifest.models["core_secret"].access == "private"
    with pytest.raises(ValueError, match="cannot ref private model"):
        materialize(spark, manifest)

    # removing the offender makes the same-group ref build fine
    (proj / "models" / "outsider.sql").write_text("select 2 as y\n")
    materialize(spark, load_project(proj))
    assert spark.table("core_user").first().x == 1
