"""Standard dbt-project layout interop: dbt_project.yml + profiles.yml +
property files (public dbt spec) load and run directly — the contract a user
with an existing dbt repo hits on minute one (reference entry point:
src/dbt_osmosis/core/config.py:610-660; demo shape: demo_duckdb/jaffle_shop).
"""

from __future__ import annotations

import textwrap

import pytest

from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.runner import materialize


def _jaffle(tmp_path):
    """A minimal standard-dbt-layout project: seeds, staged models in a
    subdirectory, a versioned model, a snapshot, config tree in
    dbt_project.yml."""
    proj = tmp_path / "jaffle"
    (proj / "models" / "staging").mkdir(parents=True)
    (proj / "seeds").mkdir()
    (proj / "snapshots").mkdir()

    (proj / "dbt_project.yml").write_text(
        textwrap.dedent(
            """
            name: "jaffle_spark"
            config-version: 2
            version: "0.1"
            profile: "jaffle"
            model-paths: ["models"]
            seed-paths: ["seeds"]
            macro-paths: ["macros"]
            snapshot-paths: ["snapshots"]
            models:
              jaffle_spark:
                +dbt-osmosis: "{node.schema}/{node.name}.yml"
                materialized: table
                staging:
                  materialized: view
            seeds:
              jaffle_spark:
                +column_types:
                  id: bigint
            vars:
              status_filter: completed
            """
        )
    )
    (proj / "profiles.yml").write_text(
        textwrap.dedent(
            """
            jaffle:
              target: dev
              outputs:
                dev:
                  type: spark
                  threads: 4
            """
        )
    )
    (proj / "seeds" / "raw_customers.csv").write_text(
        "id,first_name\n1,Ada\n2,Grace\n3,Edsger\n"
    )
    (proj / "seeds" / "raw_orders.csv").write_text(
        "id,customer_id,status,amount\n10,1,completed,5.0\n11,1,returned,7.5\n12,2,completed,3.0\n"
    )
    (proj / "models" / "staging" / "stg_customers.sql").write_text(
        "select id as customer_id, first_name from {{ ref('raw_customers') }}\n"
    )
    (proj / "models" / "staging" / "stg_customers_v2.sql").write_text(
        "select id, first_name from {{ ref('raw_customers') }}\n"
    )
    (proj / "models" / "staging" / "stg_orders.sql").write_text(
        "select id as order_id, customer_id, status, amount from {{ ref('raw_orders') }}\n"
    )
    (proj / "models" / "customers.sql").write_text(
        textwrap.dedent(
            """
            with c as (select * from {{ ref('stg_customers', v=1) }}),
            o as (select * from {{ ref('stg_orders') }}
                  where status = '{{ var("status_filter") }}')
            select c.customer_id, c.first_name,
                   count(o.order_id) as n_orders, sum(o.amount) as total
            from c left join o using (customer_id)
            group by all
            """
        )
    )
    (proj / "models" / "staging" / "stg_customers.yml").write_text(
        textwrap.dedent(
            """
            version: 2
            models:
              - name: stg_customers
                latest_version: 1
                versions:
                  - v: 1
                    config:
                      alias: stg_customers
                    columns:
                      - name: customer_id
                        data_tests: [unique, not_null]
                      - name: first_name
                  - v: 2
                    columns:
                      - name: id
                      - name: first_name
            """
        )
    )
    (proj / "models" / "customers.yml").write_text(
        textwrap.dedent(
            """
            version: 2
            models:
              - name: customers
                description: one row per customer
                columns:
                  - name: customer_id
                    tests: [unique]
            """
        )
    )
    (proj / "seeds" / "raw_customers.yml").write_text(
        textwrap.dedent(
            """
            version: 2
            seeds:
              - name: raw_customers
                description: raw customer feed
            """
        )
    )
    (proj / "snapshots" / "orders_snapshot.sql").write_text(
        textwrap.dedent(
            """
            {% snapshot orders_snapshot %}
            {{ config(unique_key='order_id', strategy='check') }}
            select * from {{ ref('stg_orders') }}
            {% endsnapshot %}
            """
        )
    )
    return proj


def test_dbt_layout_loads(tmp_path):
    m = load_project(_jaffle(tmp_path))
    assert m.project_name == "jaffle_spark"
    assert m.profile == "jaffle" and m.target == "dev"
    assert m.vars["status_filter"] == "completed"
    # seeds with tree-resolved column_types and property description
    assert m.seeds["raw_customers"].column_types == {"id": "bigint"}
    assert m.seeds["raw_customers"].description == "raw customer feed"
    # config tree: root says table, staging dir overrides to view
    assert m.models["stg_orders"].materialized == "view"
    assert m.models["customers"].materialized == "table"
    assert m.models["customers"].config.get("dbt-osmosis") == "{node.schema}/{node.name}.yml"
    # versioned model: bare node replaced by _v1/_v2, alias to latest
    assert "stg_customers" not in m.models
    assert {"stg_customers_v1", "stg_customers_v2"} <= set(m.models)
    assert m.version_aliases == {"stg_customers": "stg_customers_v1"}
    assert m.models["stg_customers_v1"].columns[0]["name"] == "customer_id"
    assert m.models["stg_customers_v2"].columns[0]["name"] == "id"
    # snapshot block parsed
    snap = m.models["orders_snapshot"]
    assert snap.materialized == "snapshot"
    assert snap.config["unique_key"] == "order_id"
    assert "stg_orders" in snap.depends_on
    # versioned dep remap: customers depends on the pinned v1
    assert "stg_customers_v1" in m.models["customers"].depends_on


def test_dbt_layout_runs_on_spark(spark, tmp_path):
    proj = _jaffle(tmp_path)
    m = load_project(proj)
    wh = str(tmp_path / "wh")
    report = materialize(spark, m, warehouse_dir=wh, count_rows=True)
    by_name = {r.name: r for r in report.results}
    assert by_name["customers"].materialized == "table"
    assert by_name["orders_snapshot"].materialized == "snapshot"
    got = {r.customer_id: (r.n_orders, r.total) for r in spark.table("customers").collect()}
    assert got[1] == (1, 5.0)  # returned order filtered by var
    assert got[2] == (1, 3.0)
    assert got[3] == (0, None)
    # snapshot table carries SCD2 columns
    cols = set(spark.table("orders_snapshot").columns)
    assert {"dbt_valid_from", "dbt_valid_to"} <= cols
    # versioned refs: v1 renames, v2 does not
    assert "customer_id" in spark.table("stg_customers_v1").columns
    assert "id" in spark.table("stg_customers_v2").columns


def test_versioned_ref_pins_and_defaults(tmp_path):
    from dbt_osmosis_spark.compile import JinjaCompiler

    m = load_project(_jaffle(tmp_path))
    c = JinjaCompiler(m)
    assert "stg_customers_v2" in c.compile("select * from {{ ref('stg_customers', v=2) }}").compiled_sql
    assert (
        "stg_customers_v1"
        in c.compile("select * from {{ ref('stg_customers') }}").compiled_sql
    )
    assert (
        "stg_customers_v2"
        in c.compile("select * from {{ ref('stg_customers', version=2) }}").compiled_sql
    )


def test_native_layout_still_loads(tmp_path):
    (tmp_path / "models").mkdir()
    (tmp_path / "project.yml").write_text("name: native\nvars: {x: 1}\n")
    (tmp_path / "models" / "m1.sql").write_text("select {{ var('x') }} as x")
    m = load_project(tmp_path)
    assert m.project_name == "native"
    assert m.models["m1"].materialized == "view"


def test_malformed_versions_do_not_crash_load(tmp_path):
    """A broken schema.yml must degrade at load (entry skipped) and be
    reported by validate_schema_doc — every CLI command goes through
    load_project, so a crash here would take down run/test/list."""
    proj = tmp_path / "p"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: p\n")
    (proj / "models" / "m.sql").write_text("select 1 as a")
    (proj / "models" / "m.yml").write_text(
        "version: 2\nmodels:\n- name: m\n  versions:\n"
        "  - v: null\n  - not-a-map\n  - v: 1a\n"
    )
    m = load_project(proj)
    # base model survives; no versioned nodes were manufactured
    assert "m" in m.models and not m.version_aliases
    # and the validator reports what the loader skipped
    import yaml as pyyaml

    from dbt_osmosis_spark.schema_validation import validate_schema_doc

    codes = {v.code for v in validate_schema_doc(pyyaml.safe_load((proj / "models" / "m.yml").read_text()))}
    assert "version-missing-v" in codes and "version-entry-not-map" in codes


def test_committed_demo_dbt_project_runs(spark, tmp_path):
    """The in-repo demo_dbt/ directory is a standard dbt layout and must
    build end-to-end (the switch-from-the-reference smoke test)."""
    m = load_project("demo_dbt")
    assert m.project_name == "demo_dbt"
    report = materialize(spark, m, warehouse_dir=str(tmp_path / "wh"), count_rows=True)
    by_name = {r.name: r for r in report.results}
    assert by_name["account_revenue"].materialized == "table"
    got = {r.account_id: float(r.revenue) for r in spark.table("account_revenue").collect()}
    assert got == {1: 12.5, 2: 9.9, 3: 44.0}
    assert {"dbt_valid_from", "dbt_valid_to"} <= set(spark.table("accounts_snapshot").columns)


def test_out_of_range_latest_version_falls_back(tmp_path):
    """latest_version pointing at an undeclared version (ADVICE r2) must
    degrade to max(declared) at load — not mint a dangling alias that later
    KeyErrors every bare ref() at compile time."""
    proj = tmp_path / "p"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: p\n")
    (proj / "models" / "m.sql").write_text("select 1 as a")
    (proj / "models" / "user.sql").write_text("select * from {{ ref('m') }}")
    (proj / "models" / "m.yml").write_text(
        "version: 2\nmodels:\n- name: m\n  latest_version: 3\n  versions:\n"
        "  - v: 1\n  - v: 2\n"
    )
    m = load_project(proj)
    assert m.version_aliases["m"] == "m_v2"
    assert "m_v2" in m.models["user"].depends_on
    # the degraded entry is still REPORTED by the validator
    import yaml as pyyaml

    from dbt_osmosis_spark.schema_validation import validate_schema_doc

    codes = {
        v.code
        for v in validate_schema_doc(
            pyyaml.safe_load((proj / "models" / "m.yml").read_text())
        )
    }
    assert "latest-version-invalid" in codes


def _declared_only_proj(tmp_path):
    proj = tmp_path / "p"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: p\n")
    (proj / "models" / "sources.yml").write_text(
        "version: 2\nsources:\n- name: raw\n  tables:\n  - name: native_tbl\n"
    )
    (proj / "models" / "ok.sql").write_text("select 1 as a")
    (proj / "models" / "uses_src.sql").write_text(
        "select * from {{ source('raw', 'native_tbl') }}"
    )
    return proj


def test_declared_only_source_loads_and_names_failures(spark, tmp_path):
    """A warehouse-native source without a file location (ADVICE r2) loads
    as a declared-only node — visible to lineage/yaml — and a model reading
    it fails with a diagnostic NAMING the source, not a generic
    unresolved-ref error; models not reading it still run."""
    import pytest

    m = load_project(_declared_only_proj(tmp_path))
    assert m.sources["raw.native_tbl"].path is None
    # compile resolves source() cleanly (it IS declared)
    from dbt_osmosis_spark.compile import JinjaCompiler

    compiled = JinjaCompiler(m).compile(m.models["uses_src"].raw_sql)
    assert "native_tbl" in compiled.compiled_sql
    # running only the independent model succeeds
    report = materialize(spark, m, warehouse_dir=str(tmp_path / "wh"), select=["ok"])
    assert any(r.name == "ok" for r in report.results)
    # running the reader names the source and the model in the error
    with pytest.raises(ValueError, match="uses_src.*raw.native_tbl"):
        materialize(spark, m, warehouse_dir=str(tmp_path / "wh2"))
    # read-only registration (test/profile/yaml commands) must NOT fail:
    # the source is never compiled against unless the reader executes
    report_ro = materialize(spark, m, warehouse_dir=str(tmp_path / "wh3"), read_only=True)
    assert any(r.name == "ok" for r in report_ro.results)


def test_manifest_json_artifact_roundtrip(spark, tmp_path):
    """dbt artifact interop (SURVEY M1-plane; reference consumes the live
    Manifest at src/dbt_osmosis/core/config.py:437-453): serializing the
    demo_dbt manifest to the public target/manifest.json schema and loading
    it back must produce an equivalent project — same nodes, same compiled
    SQL, and a `run` with identical results."""
    from dbt_osmosis_spark.artifacts import load_manifest_json, write_manifest_json
    from dbt_osmosis_spark.compile import JinjaCompiler

    m1 = load_project("demo_dbt")
    art = tmp_path / "target" / "manifest.json"
    write_manifest_json(m1, art)
    m2 = load_manifest_json(art, project_dir="demo_dbt")

    assert set(m2.models) == set(m1.models)
    assert set(m2.seeds) == set(m1.seeds)
    assert set(m2.sources) == set(m1.sources)
    assert m2.version_aliases == m1.version_aliases
    for name in m1.models:
        assert m2.models[name].depends_on == m1.models[name].depends_on, name
        assert m2.models[name].materialized == m1.models[name].materialized, name
    # compile parity: identical compiled SQL for every model
    c1, c2 = JinjaCompiler(m1), JinjaCompiler(m2)
    for name in m1.models:
        if m1.models[name].language != "sql":
            continue
        assert (
            c1.compile(m1.models[name].raw_sql).compiled_sql
            == c2.compile(m2.models[name].raw_sql).compiled_sql
        ), name
    # run parity: materialize the reloaded project; same flagship result
    report = materialize(spark, m2, warehouse_dir=str(tmp_path / "wh"), count_rows=True)
    got = {r.account_id: float(r.revenue) for r in spark.table("account_revenue").collect()}
    assert got == {1: 12.5, 2: 9.9, 3: 44.0}
    by_name = {r.name: r for r in report.results}
    assert by_name["account_revenue"].materialized == "table"


def test_manifest_json_versioned_and_declared_only(spark, tmp_path):
    """Versioned models (version/latest_version fields) and declared-only
    sources survive the artifact round-trip."""
    from dbt_osmosis_spark.artifacts import load_manifest_json, write_manifest_json

    m1 = load_project(_jaffle(tmp_path))
    art = tmp_path / "manifest.json"
    write_manifest_json(m1, art)
    m2 = load_manifest_json(art, project_dir=str(tmp_path / "jaffle"))
    assert {"stg_customers_v1", "stg_customers_v2"} <= set(m2.models)
    assert m2.version_aliases == {"stg_customers": "stg_customers_v1"}
    assert "stg_customers_v1" in m2.models["customers"].depends_on

    m3 = load_project(_declared_only_proj(tmp_path))
    art2 = tmp_path / "manifest2.json"
    write_manifest_json(m3, art2)
    m4 = load_manifest_json(art2)
    assert m4.sources["raw.native_tbl"].path is None


def test_cli_accepts_manifest_artifact(spark, tmp_path, capsys):
    """`run --manifest target/manifest.json` builds without the project
    source tree being parsed."""
    from dbt_osmosis_spark.artifacts import write_manifest_json
    from dbt_osmosis_spark.cli import main

    m1 = load_project("demo_dbt")
    art = tmp_path / "manifest.json"
    write_manifest_json(m1, art)
    rc = main(
        [
            "--manifest", str(art),
            "--project-dir", "demo_dbt",
            "--warehouse-dir", str(tmp_path / "wh"),
            "run",
        ]
    )
    assert rc == 0
    assert "account_revenue" in capsys.readouterr().out


def test_manifest_artifact_is_portable_across_roots(tmp_path):
    """An artifact written with project_dir has project-relative seed/source
    paths (dbt's own convention), so moving the project tree and re-rooting
    with a new project_dir resolves every path — the machine-hand-off case
    the module docstring promises."""
    import json as _json
    import shutil
    from pathlib import Path

    from dbt_osmosis_spark.artifacts import load_manifest_json, write_manifest_json

    rootA = tmp_path / "A"
    shutil.copytree("demo_dbt", rootA)
    m1 = load_project(rootA)
    art = tmp_path / "manifest.json"
    write_manifest_json(m1, art, project_dir=str(rootA))

    doc = _json.loads(art.read_text())
    for entry in doc["nodes"].values():
        if entry["resource_type"] == "seed":
            assert not entry["original_file_path"].startswith("/"), entry
    # re-root on a "different machine" (the moved tree)
    rootB = tmp_path / "B"
    shutil.move(str(rootA), rootB)
    m2 = load_manifest_json(art, project_dir=str(rootB))
    for seed in m2.seeds.values():
        assert Path(seed.path).is_file(), seed.path


def test_load_run_results_dbt_core_shapes(tmp_path):
    """run_results.json interop: names come from unique_id — dbt-core's
    relation_name is a quoted fully-qualified string and must not leak in;
    versioned models and sources map to the engine's local node names."""
    import json as _json

    from dbt_osmosis_spark.artifacts import load_run_results

    doc = {
        "results": [
            {
                "unique_id": "model.jaffle.customers",
                "relation_name": '"dev"."main"."customers"',
                "status": "error",
            },
            {"unique_id": "model.jaffle.stg_customers.v2", "status": "skipped"},
            {"unique_id": "source.jaffle.raw.orders_tbl", "status": "success"},
            {"unique_id": "seed.jaffle.raw_customers", "status": "success"},
        ]
    }
    p = tmp_path / "run_results.json"
    p.write_text(_json.dumps(doc))
    got = load_run_results(p)
    assert got == {
        "customers": "error",
        "stg_customers_v2": "skipped",
        "raw.orders_tbl": "success",
        "raw_customers": "success",
    }


def test_profiles_dir_and_target_overrides(tmp_path):
    """dbt --profiles-dir/--target: profiles.yml can live outside the
    project tree, and the target override wins over the profile default."""
    proj = _jaffle(tmp_path)
    (proj / "profiles.yml").unlink()
    alt = tmp_path / "creds"
    alt.mkdir()
    (alt / "profiles.yml").write_text(
        "jaffle:\n  target: prod\n  outputs:\n    prod:\n      type: spark\n"
    )
    m = load_project(proj, profiles_dir=alt)
    assert m.profile == "jaffle" and m.target == "prod"
    m2 = load_project(proj, profiles_dir=alt, target="ci")
    assert m2.target == "ci"


def test_target_name_reaches_jinja(tmp_path):
    """--target / profile target flows into {{ target.name }} so
    environment-branching project logic compiles correctly."""
    from dbt_osmosis_spark.compile import JinjaCompiler

    proj = _jaffle(tmp_path)
    m = load_project(proj)
    assert m.target == "dev"
    sql = "select '{{ target.name }}' as env"
    assert "'dev'" in JinjaCompiler(m).compile(sql).compiled_sql
    m2 = load_project(proj, target="prod")
    assert "'prod'" in JinjaCompiler(m2).compile(sql).compiled_sql


def test_profiles_dir_typo_errors_loudly(tmp_path):
    import pytest as _pytest

    proj = _jaffle(tmp_path)
    with _pytest.raises(ValueError, match="no profiles.yml"):
        load_project(proj, profiles_dir=tmp_path / "nope")
