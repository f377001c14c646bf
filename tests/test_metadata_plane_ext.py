"""Metadata plane extensions: settings chain, path routing, restructuring,
source bootstrap, suggestions/discovery/style, LLM synthesis control plane,
serving session, formatter, YAML validators (SURVEY M18-M22, M31-M37, L1-L4,
S19-S20)."""

from __future__ import annotations

import shutil

import pytest
import yaml as pyyaml

from dbt_osmosis_spark.formatting import run_formatter
from dbt_osmosis_spark.llm import (
    BULK_THRESHOLD,
    HeuristicBackend,
    generate_staging_model,
    nl_to_sql,
    synthesize_missing_documentation,
    with_retries,
)
from dbt_osmosis_spark.path_management import (
    PathTemplate,
    create_missing_source_yamls,
    resolve_yaml_path,
)
from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.restructuring import apply_restructure_plan, draft_restructure_plan
from dbt_osmosis_spark.runner import materialize
from dbt_osmosis_spark.schema_validation import validate_schema_doc
from dbt_osmosis_spark.serving import (
    SqlSession,
    information_schema_columns,
    information_schema_tables,
    intercept_ddl_comment,
)
from dbt_osmosis_spark.settings import PropertyAccessor, SettingsResolver, has_unrendered_jinja
from dbt_osmosis_spark.suggestions import (
    column_pattern,
    coverage_stats,
    find_documentation_gaps,
    mine_doc_style,
    suggest_tests,
)
from dbt_osmosis_spark.transforms import YamlRefactorContext, inject_missing_columns, sync_to_yaml
from dbt_osmosis_spark.yaml_engine import YamlHandler

DEMO = "/root/repo/demo_spark"


@pytest.fixture()
def project_copy(tmp_path):
    dst = tmp_path / "proj"
    shutil.copytree(DEMO, dst)
    return str(dst)


@pytest.fixture()
def ctx(spark, project_copy, tmp_path):
    manifest = load_project(project_copy)
    materialize(spark, manifest, warehouse_dir=str(tmp_path / "wh"))
    return YamlRefactorContext(spark=spark, manifest=manifest, project_dir=project_copy)


# ---------------------------------------------------------------- settings


class _Node:
    def __init__(self, config):
        self.config = config


def test_settings_precedence_column_beats_node_beats_context():
    r = SettingsResolver(context_settings={"skip-add-tags": "ctx"})
    node = _Node({"meta": {"skip-add-tags": "node"}})
    column = {"meta": {"dbt-osmosis-skip-add-tags": "col"}}
    assert r.resolve("skip_add_tags", node=node, column=column) == "col"
    assert r.resolve("skip_add_tags", node=node) == "node"
    assert r.resolve("skip_add_tags") == "ctx"
    assert r.resolve("missing", fallback=7) == 7


def test_settings_key_variants_and_options_nesting():
    r = SettingsResolver()
    node = _Node({"dbt_osmosis_options": {"output-to-lower": True}})
    assert r.resolve("output_to_lower", node=node) is True
    node2 = _Node({"dbt-osmosis-sort-by": "alphabetical"})
    assert r.resolve("sort_by", node=node2) == "alphabetical"


def test_settings_project_vars_namespace():
    r = SettingsResolver(project_vars={"dbt-osmosis": {"sort-by": "database"}, "threads": 4})
    assert r.resolve("sort_by") == "database"
    # direct project var only matches prefixed/options spellings, not bare
    assert r.resolve("threads") is None


def test_property_accessor_auto_prefers_rendered_yaml():
    acc = PropertyAccessor(
        manifest_props={"m": {"description": "from manifest"}},
        yaml_props={"m": {"description": "from yaml"}},
    )
    assert acc.get("m", "description") == "from yaml"
    acc.yaml_props["m"]["description"] = "{{ doc('x') }}"
    assert acc.get("m", "description") == "from manifest"
    assert has_unrendered_jinja("{% if x %}y{% endif %}")
    acc.source = "manifest"
    assert acc.get("m", "description") == "from manifest"


# ------------------------------------------------------- path routing


def test_resolve_yaml_path_most_specific_route(ctx):
    node = ctx.manifest.models["stg_orders"]
    routes = [
        PathTemplate("", "_docs/{model}.yml"),
        PathTemplate("models/staging", "{parent}/_staging_schema.yml"),
    ]
    p = resolve_yaml_path(node, ctx.project_dir, routes)
    assert p.name == "_staging_schema.yml"
    assert "staging" in str(p)
    other = ctx.manifest.models["customers"]
    assert resolve_yaml_path(other, ctx.project_dir, routes).parent.name == "_docs"


def test_resolve_yaml_path_traversal_guard(ctx):
    node = ctx.manifest.models["customers"]
    with pytest.raises(ValueError):
        resolve_yaml_path(node, ctx.project_dir, [PathTemplate("", "../../{model}.yml")])


def test_create_missing_source_yamls(spark, ctx):
    spark.range(3).selectExpr("id", "id * 2 as v").createOrReplaceTempView(
        "raw_brand_new_table"
    )
    try:
        result = create_missing_source_yamls(spark, ctx.manifest, ctx.project_dir)
        assert "raw_brand_new_table" in result.created
        doc = pyyaml.safe_load(result.path.read_text())
        tables = {t["name"]: t for s in doc["sources"] for t in s["tables"]}
        assert {"name": "id", "data_type": "bigint"} in tables["raw_brand_new_table"]["columns"]
        assert "main.raw_brand_new_table" in ctx.manifest.sources
        # idempotent: second sweep adds nothing
        again = create_missing_source_yamls(spark, ctx.manifest, ctx.project_dir)
        assert "raw_brand_new_table" not in again.created
    finally:
        spark.catalog.dropTempView("raw_brand_new_table")


# ------------------------------------------------------ restructuring


def test_restructure_plan_and_apply(ctx):
    inject_missing_columns(ctx)
    written = sync_to_yaml(ctx)  # sidecar files exist now
    assert written
    routes = [PathTemplate("", "_schemas/{model}.yml")]
    plan = draft_restructure_plan(ctx.manifest, ctx.project_dir, routes)
    assert not plan.empty
    targets = apply_restructure_plan(plan, YamlHandler())
    assert all(t.parent.name == "_schemas" for t in targets)
    moved = pyyaml.safe_load((targets[0].parent / "customers.yml").read_text())
    names = [m["name"] for m in moved["models"]]
    assert "customers" in names
    # superseded sidecars drained of their model entries are deleted
    for name, node in ctx.manifest.models.items():
        old = ctx.doc_path(name)
        assert not old.exists() or pyyaml.safe_load(old.read_text()).get("models")


# ------------------------------------------- suggestions / discovery


def test_column_pattern_and_test_suggestions():
    assert column_pattern("customer_id") == "id"
    assert column_pattern("created_at") == "temporal"
    assert column_pattern("is_active") == "boolean_flag"
    columns_of = {
        "orders": {"order_id": {}, "order_date": {}, "note": {}},
        "payments": {"payment_id": {}},
    }
    existing = {
        ("customers", "customer_id"): ["unique", "not_null"],
        ("nations", "nation_id"): ["unique", "not_null"],
    }
    got = suggest_tests(columns_of, existing)
    by_col = {(s.node, s.column, s.test) for s in got}
    assert ("orders", "order_id", "unique") in by_col
    assert ("payments", "payment_id", "not_null") in by_col
    assert not any(s.column == "note" for s in got)
    mined = [s for s in got if s.column == "order_id"]
    assert all(s.confidence >= 0.5 for s in mined)  # mined beats defaults


def test_coverage_and_gaps_and_style(ctx):
    columns_of = {
        "customers": {
            "customer_id": {"description": "Identifies the customer record."},
            "first_name": {"description": ""},
            "last_name": {"description": "tbd"},
        },
        "stg_orders": {"order_id": {"description": "Identifies the order placed."}},
    }
    stats = coverage_stats(columns_of)
    assert stats.total_columns == 4 and stats.documented == 2
    assert ("customers", "first_name") in stats.missing
    assert ("customers", "last_name") in stats.generic
    gaps = find_documentation_gaps(ctx.manifest, columns_of)
    assert gaps and gaps[0][0] == "customers"
    style = mine_doc_style(columns_of)
    assert style.n_descriptions == 3
    assert style.tone_markers["ends_period"] == 2


# ----------------------------------------------------------- llm (L1-L4)


def test_synthesize_missing_documentation_single_and_bulk():
    backend = HeuristicBackend()
    columns_of = {
        "orders": {"order_id": {"description": ""}, "status": {"description": "ok already"}},
        "wide": {f"col_{i}_id": {"description": ""} for i in range(BULK_THRESHOLD + 2)},
    }
    report = synthesize_missing_documentation(columns_of, ["orders", "wide"], backend)
    assert report.single_calls == 1 and report.bulk_calls == 1
    assert columns_of["orders"]["order_id"]["description"].startswith("Identifier")
    assert all(v["description"] for v in columns_of["wide"].values())
    # deterministic: same input → same output
    assert backend.complete("COLUMN\norders\norder_id") == backend.complete(
        "COLUMN\norders\norder_id"
    )


def test_with_retries_backoff():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("boom")
        return "ok"

    sleeps: list[float] = []
    assert with_retries(flaky, sleep=sleeps.append) == "ok"
    assert sleeps == [1.0, 2.0]
    with pytest.raises(RuntimeError):
        with_retries(lambda: (_ for _ in ()).throw(ValueError()), sleep=lambda s: None)


def test_nl_to_sql_and_staging_generation(ctx):
    sql = nl_to_sql("top customers by spend", ctx.manifest)
    assert "ref(" in sql and sql.startswith("--")
    spec = generate_staging_model("main.raw_payments", ["raw_ID", "raw_amount", "ok"])
    rendered = spec.to_sql(["raw_ID", "raw_amount", "ok"])
    assert "raw_ID as id" in rendered and "raw_amount as amount" in rendered
    assert "source('main', 'raw_payments')" in rendered


# ------------------------------------------------------ serving (M34)


def test_intercept_ddl_comment_variants():
    up = intercept_ddl_comment("ALTER TABLE customers ALTER COLUMN email COMMENT 'pii'")
    assert (up.table, up.column, up.comment) == ("customers", "email", "pii")
    up2 = intercept_ddl_comment("comment on table orders is 'fact table'")
    assert (up2.table, up2.column) == ("orders", None)
    assert intercept_ddl_comment("select 1") is None


def test_sql_session_and_info_schema(spark, ctx):
    session = SqlSession(spark=spark, manifest=ctx.manifest)
    assert session.query("ALTER TABLE customers ALTER COLUMN email COMMENT 'pii'") is None
    assert session.comments[("customers", "email")] == "pii"
    df = session.query("select count(*) as n from {{ ref('customers') }}")
    assert df.collect()[0]["n"] > 0
    tables = information_schema_tables(spark)
    assert "customers" in {r.table_name for r in tables.collect()}
    cols = information_schema_columns(spark)
    got = {r.column_name for r in cols.filter("table_name = 'customers'").collect()}
    assert "customer_id" in got
    assert "customers" in session.schema_map()["default"]


# -------------------------------------------------- formatter + validators


def test_run_formatter_non_fatal(tmp_path):
    f = tmp_path / "x.yml"
    f.write_text("a: 1\n")
    assert run_formatter("true", [f]) is True
    assert run_formatter("false", [f]) is False
    assert run_formatter("definitely-not-a-real-binary-xyz", [f]) is False
    assert run_formatter("", []) is True


def test_validate_schema_doc():
    ok = {
        "version": 2,
        "models": [
            {
                "name": "m1",
                "columns": [
                    {"name": "id", "tests": ["unique", {"accepted_values": {"values": [1]}}]},
                ],
            }
        ],
    }
    assert validate_schema_doc(ok) == []
    bad = {
        "models": [
            {"name": "m1", "columns": [{"name": "id"}, {"name": "id"}]},
            {"name": "m1"},
            {"columns": []},
            {
                "name": "m2",
                "columns": [
                    {"name": "c", "tests": [{"accepted_values": {}}, {"relationships": {"to": "x"}}]}
                ],
            },
        ],
        "sources": [{"tables": [{}]}],
    }
    codes = {v.code for v in validate_schema_doc(bad)}
    assert {
        "duplicate-column",
        "duplicate-model",
        "model-missing-name",
        "accepted-values-args",
        "relationships-args",
        "source-missing-name",
    } <= codes


def test_analyze_column_semantics():
    from dbt_osmosis_spark.llm import analyze_column_semantics

    got = analyze_column_semantics("orders", "customer_id", "bigint")
    assert got["semantic_type"] == "identifier"
    assert {"to": "customer", "kind": "foreign_key_candidate"} in got["relationships"]
    assert analyze_column_semantics("orders", "order_date")["semantic_type"] == "timestamp"
    assert analyze_column_semantics("c", "is_active")["semantic_type"] == "flag"
    assert analyze_column_semantics("c", "c_acctbal")["semantic_type"] == "monetary"
    assert "pii" in analyze_column_semantics("c", "email_address")["tags"]
    assert analyze_column_semantics("c", "c_mktsegment")["semantic_type"] == "category"


def test_supplementary_settings_file_and_fusion_sync(spark, project_copy, tmp_path):
    import pathlib

    from dbt_osmosis_spark.transforms import (
        YamlRefactorContext,
        inject_missing_columns,
        sync_to_yaml,
    )

    pathlib.Path(project_copy, "dbt-osmosis.yml").write_text(
        "fusion-compat: true\nsort-by: alphabetical\n"
    )
    manifest = load_project(project_copy)
    materialize(spark, manifest, warehouse_dir=str(tmp_path / "wh2"))
    ctx = YamlRefactorContext(spark=spark, manifest=manifest, project_dir=project_copy)
    assert ctx.settings["fusion_compat"] is True
    assert ctx.settings["sort_by"] == "alphabetical"

    inject_missing_columns(ctx)
    ctx.columns_of["customers"]["customer_id"]["tags"] = ["pk"]
    ctx.columns_of["customers"]["customer_id"]["meta"] = {"owner": "core"}
    sync_to_yaml(ctx, "customers")
    doc = pyyaml.safe_load(ctx.doc_path("customers").read_text())
    col = next(c for c in doc["models"][0]["columns"] if c["name"] == "customer_id")
    # fusion-compat: meta/tags nested under config, not flat
    assert col["config"] == {"meta": {"owner": "core"}, "tags": ["pk"]}
    assert "tags" not in col and "meta" not in col


def test_validate_schema_doc_test_args_depth():
    """Reference-depth test-config checks: arguments: nesting, unknown
    tests, unique_combination arity (reference validation.py:330-781)."""
    doc = {
        "models": [
            {
                "name": "m",
                "columns": [
                    {
                        "name": "c",
                        "tests": [
                            "totally_made_up",
                            {"accepted_values": {"arguments": {"values": []}}},
                            {"relationships": {"arguments": {"to": "ref('x')", "field": "id"}}},
                            {"unique_combination_of_columns": {"combination_of_columns": ["a"]}},
                            {"accepted_values": {"arguments": "nope"}},
                        ],
                    }
                ],
            }
        ]
    }
    vs = validate_schema_doc(doc)
    codes = {(v.code, v.severity) for v in vs}
    assert ("unknown-test", "warning") in codes
    assert ("accepted-values-empty", "warning") in codes
    assert ("unique-combination-few", "warning") in codes
    assert ("test-arguments-not-map", "error") in codes
    # the well-formed relationships test produced no violation
    assert not any(v.code == "relationships-args" for v in vs)


def test_validate_schema_doc_versions_depth():
    doc = {
        "models": [
            {
                "name": "m",
                "latest_version": 3,
                "versions": [
                    {"v": 1},
                    {"v": "1"},  # duplicate identity with 1
                    {"v": True},  # bool is not a valid version
                    {
                        "v": 2,
                        "columns": [
                            {"include": "all", "exclude": ["x"]},
                            {"include": ["a"], "exclude": ["b"]},  # exclude needs include-all
                        ],
                    },
                ],
            },
            {"name": "m2", "latest_version": 1},  # latest without versions
        ]
    }
    codes = [v.code for v in validate_schema_doc(doc)]
    assert "duplicate-version" in codes
    assert "version-v-type" in codes
    assert "latest-version-invalid" in codes  # 3 not declared; and m2's
    assert codes.count("latest-version-invalid") == 2
    assert "version-selector-multiple" in codes
    assert "include-exclude-conflict" in codes


def test_validate_version_selector_rules():
    base = {"models": [{"name": "m", "versions": [{"v": 1, "columns": [None]}]}]}

    def _codes(col):
        d = {"models": [{"name": "m", "versions": [{"v": 1, "columns": [col]}]}]}
        return {v.code for v in validate_schema_doc(d)}

    assert "version-selector-include" in _codes({"exclude": ["a"]})
    assert "version-selector-include" in _codes({"include": 42})
    assert "version-selector-exclude" in _codes({"include": "all", "exclude": "a"})
    assert _codes({"include": "*", "exclude": ["a"]}) == set()
    assert _codes({"include": ["a", "b"]}) == set()
    # a non-map column still reports missing name
    assert "column-missing-name" in {v.code for v in validate_schema_doc(base)}


def test_yaml_check_schemas_cli(tmp_path, capsys):
    from dbt_osmosis_spark.cli import main

    (tmp_path / "models").mkdir()
    (tmp_path / "project.yml").write_text("name: p\n")
    (tmp_path / "models" / "m.sql").write_text("select 1 as a")
    (tmp_path / "models" / "m.yml").write_text(
        "version: 2\nmodels:\n- name: m\n  columns:\n  - name: a\n    tests:\n"
        "    - relationships: {to: x}\n"
    )
    rc = main(["--project-dir", str(tmp_path), "yaml", "check-schemas"])
    outp = capsys.readouterr().out
    assert rc == 1
    assert "relationships-args" in outp


def test_doc_style_depth_terminology_and_tone():
    from dbt_osmosis_spark.suggestions import mine_doc_style

    columns_of = {
        "m1": {
            "a": {"description": "Unique id for the customer record."},
            "b": {"description": "Timestamp when the customer signed up."},
            "c": {"description": "Contains the timestamp of the last datetime sync."},
            "d": {"description": "is used to join against the client table"},
        },
    }
    style = mine_doc_style(columns_of)
    assert style.tone_markers["technical"] >= 2
    assert style.tone_markers["imperative"] >= 1
    assert style.tone_markers["passive"] >= 1
    # 'timestamp' (2 uses) dominates its alternatives (reference records
    # the last dominated alternative)
    assert style.terminology.get("timestamp") in {"datetime", "created at", "updated at"}
    ctxt = style.to_prompt_context()
    assert "preferred terms" in ctxt and "example:" in ctxt


def test_find_similar_documented_nodes_and_examples():
    from dbt_osmosis_spark.suggestions import (
        extract_style_examples,
        find_similar_documented_nodes,
    )

    columns_of = {
        "target": {"x": {"description": ""}, "y": {"description": ""}},
        "good_twin": {
            "a": {"description": "The customer key."},
            "b": {"description": "The order total."},
        },
        "undocumented": {"a": {"description": ""}, "b": {"description": ""}},
        "big_documented": {
            str(i): {"description": f"Column {i} meaning."} for i in range(20)
        },
    }
    sims = find_similar_documented_nodes(columns_of, "target")
    names = [n for n, _ in sims]
    assert "good_twin" in names and "undocumented" not in names
    # same column count + fully documented ranks first
    assert names[0] == "good_twin"
    ex = extract_style_examples(columns_of, target_node="target")
    assert any("customer key" in e for e in ex)


def test_progenitor_override_pins_inheritance_source():
    """M8: column_default_progenitor / default_progenitor pin which ancestor
    a column inherits from, overriding the closest-wins default
    (reference: inheritance.py:747-806)."""
    from dbt_osmosis_spark.inheritance import build_knowledge_graph
    from dbt_osmosis_spark.project import Manifest, ModelNode

    m = Manifest()
    m.models["grandparent"] = ModelNode(name="grandparent", raw_sql="", path="g.sql")
    m.models["parent"] = ModelNode(
        name="parent", raw_sql="", path="p.sql", depends_on=["grandparent"]
    )
    m.models["child"] = ModelNode(
        name="child", raw_sql="", path="c.sql", depends_on=["parent"]
    )
    columns_of = {
        "grandparent": {"k": {"description": "from grandparent"}},
        "parent": {"k": {"description": "from parent"}},
        "child": {"k": {"description": ""}},
    }
    # default: closest ancestor wins
    g = build_knowledge_graph(m, "child", columns_of)
    assert g["k"].description == "from parent" and g["k"].progenitor == "parent"

    # column-level pin to the farther ancestor
    columns_of["child"]["k"]["meta"] = {"column_default_progenitor": "grandparent"}
    g = build_knowledge_graph(m, "child", columns_of)
    assert g["k"].description == "from grandparent" and g["k"].progenitor == "grandparent"

    # a pin to a non-ancestor is ignored
    columns_of["child"]["k"]["meta"] = {"column_default_progenitor": "stranger"}
    g = build_knowledge_graph(m, "child", columns_of)
    assert g["k"].progenitor == "parent"

    # model-level default_progenitor applies to all columns without a pin
    columns_of["child"]["k"].pop("meta")
    m.models["child"].meta = {"default_progenitor": "grandparent"}
    g = build_knowledge_graph(m, "child", columns_of)
    assert g["k"].progenitor == "grandparent"


def test_restructure_preserves_user_sections_and_prunes_dirs(tmp_path):
    """M22 depth: a superseded file with exposures (or any user-authored
    section) survives model draining; a fully drained file is deleted and
    its emptied directory pruned; dry_run touches nothing."""
    from dbt_osmosis_spark.restructuring import (
        RestructureDeltaPlan,
        RestructureOperation,
        apply_restructure_plan,
    )
    from dbt_osmosis_spark.yaml_engine import YamlHandler

    import yaml as pyyaml

    yaml = YamlHandler()
    keep = tmp_path / "models" / "keep.yml"
    keep.parent.mkdir(parents=True)
    # user-authored file with a section the engine does not manage
    keep.write_text(
        pyyaml.safe_dump(
            {
                "version": 2,
                "models": [{"name": "m1", "columns": [{"name": "a", "description": "d"}]}],
                "exposures": [{"name": "dash", "type": "dashboard"}],
            }
        )
    )
    drained_dir = tmp_path / "models" / "sub"
    drained_dir.mkdir()
    gone = drained_dir / "gone.yml"
    yaml.write(gone, {"version": 2, "models": [{"name": "m2", "description": "two"}]})

    target = tmp_path / "models" / "all.yml"
    plan = RestructureDeltaPlan(
        operations=[
            RestructureOperation(target=target, models=["m1"], superseded=[keep]),
            RestructureOperation(target=target, models=["m2"], superseded=[gone]),
        ]
    )

    # dry run: nothing on disk changes
    apply_restructure_plan(plan, yaml, dry_run=True)
    assert not target.exists() and gone.exists()

    apply_restructure_plan(plan, YamlHandler())
    doc = YamlHandler().read(target)
    names = {m["name"] for m in doc["models"]}
    assert names == {"m1", "m2"}
    assert doc["models"][0]["columns"][0]["description"] == "d"
    # exposures kept the file alive, models drained out of it
    kept_doc = YamlHandler().read(keep)
    assert kept_doc["exposures"] and not kept_doc.get("models")
    # fully drained file and its now-empty directory are gone
    assert not gone.exists() and not drained_dir.exists()


def test_restructure_same_path_supersede_noop(tmp_path):
    from dbt_osmosis_spark.restructuring import (
        RestructureDeltaPlan,
        RestructureOperation,
        apply_restructure_plan,
    )
    from dbt_osmosis_spark.yaml_engine import YamlHandler

    yaml = YamlHandler()
    f = tmp_path / "same.yml"
    yaml.write(f, {"version": 2, "models": [{"name": "m", "description": "keep me"}]})
    plan = RestructureDeltaPlan(
        operations=[RestructureOperation(target=f, models=["m"], superseded=[f])]
    )
    apply_restructure_plan(plan, YamlHandler())
    doc = YamlHandler().read(f)
    assert doc["models"][0]["description"] == "keep me"


def test_wire_server_loop(spark, tmp_path):
    """M34 wire loop: JSON-lines TCP server over SqlSession — query,
    DDL-comment intercept, schema op, and error path."""
    import json
    import socket
    import threading

    from dbt_osmosis_spark.project import Manifest, ModelNode
    from dbt_osmosis_spark.serving import serve_wire

    m = Manifest()
    m.models["served_model"] = ModelNode(
        name="served_model", raw_sql="select 1 as one", path="m.sql"
    )
    spark.createDataFrame([(1, "x")], "id long, name string").createOrReplaceTempView(
        "wire_demo"
    )
    srv = serve_wire(spark, m)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        f = sock.makefile("rw")

        def ask(payload):
            f.write(json.dumps(payload) + "\n")
            f.flush()
            return json.loads(f.readline())

        r = ask({"sql": "select id, name from wire_demo order by id"})
        assert r["columns"] == ["id", "name"] and r["rows"] == [[1, "x"]]
        # jinja compiles through the manifest
        r = ask({"sql": "select * from {{ ref('served_model') }}"})
        assert "error" in r or r["rowcount"] >= 0  # ref resolves to view name; view may not exist
        # DDL comment intercept mutates the manifest, returns ok
        r = ask({"sql": "COMMENT ON TABLE served_model IS 'served docs'"})
        assert r == {"ok": True}
        assert m.models["served_model"].description == "served docs"
        r = ask({"op": "schema"})
        assert "wire_demo" in r["schema"].get("default", r["schema"].get("", {}))
        r = ask({"sql": "select broken syntax from"})
        assert "error" in r
        # workbench op (M35): compile + lint + preview + profile in ONE
        # round-trip — the reference's compile-on-edit loop (workbench/
        # app.py:423-489) without the UI framework
        r = ask(
            {
                "op": "workbench",
                "sql": "SELECT id, name from wire_demo where id > 0",
                "preview": 10,
            }
        )
        assert "SELECT" in r["compiled_sql"]
        assert r["columns"] == ["id", "name"] and r["rows"] == [[1, "x"]]
        assert any(fnd["rule"] == "keyword-case" for fnd in r["lint"])
        assert r["profile"]["id"] == {"nulls": 0, "distinct": 1, "min": 1, "max": 1}
        assert r["profile"]["name"]["distinct"] == 1
        # compile-on-edit: jinja in the edited buffer compiles through the
        # manifest before lint/preview
        r = ask(
            {
                "op": "workbench",
                "sql": "select one from {{ ref('served_model') }}",
            }
        )
        assert "served_model" in r.get("compiled_sql", "") or "error" in r
        sock.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_check_schemas_scopes_sources_yml_skip(tmp_path):
    """Only a ROOT-level sources.yml (the native-layout registry) escapes
    schema validation; a models/sources.yml is a normal dbt property file
    and must be validated like any other (ADVICE r2)."""
    from dbt_osmosis_spark.schema_validation import validate_project_schemas

    proj = tmp_path / "p"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: p\n")
    # root registry: path-explicit, NOT a property file — stays skipped
    (proj / "sources.yml").write_text("sources:\n- name: raw\n  tables: []\n")
    # nested property file with a violation (table entry missing a name)
    (proj / "models" / "sources.yml").write_text(
        "version: 2\nsources:\n- name: raw\n  tables:\n  - description: no name here\n"
    )
    out = validate_project_schemas(str(proj))
    assert any("models" in f and "sources.yml" in f for f in out), out
