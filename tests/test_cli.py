"""CLI surface (reference: src/dbt_osmosis/cli/main.py) driven in-process."""

from __future__ import annotations

import json
import shutil

import pytest
import yaml as pyyaml

from dbt_osmosis_spark.cli import main

DEMO = "/root/repo/demo_spark"


@pytest.fixture()
def proj(tmp_path, spark):
    dst = tmp_path / "proj"
    shutil.copytree(DEMO, dst)
    return str(dst)


def _run(proj, tmp_path, *argv) -> int:
    return main(["--project-dir", proj, "--warehouse-dir", str(tmp_path / "wh"), *argv])


def test_cli_run_and_sql(proj, tmp_path, capsys):
    assert _run(proj, tmp_path, "run") == 0
    out = capsys.readouterr().out
    assert "customers" in out and "seed" in out

    assert _run(proj, tmp_path, "sql", "compile", "select * from {{ ref('stg_orders') }}") == 0
    assert "stg_orders" in capsys.readouterr().out

    assert _run(
        proj, tmp_path, "sql", "run", "select count(*) as n from {{ ref('customers') }}"
    ) == 0
    assert "n" in capsys.readouterr().out


def test_cli_yaml_refactor_and_check(proj, tmp_path, capsys):
    assert _run(proj, tmp_path, "yaml", "refactor") == 0
    out = capsys.readouterr().out
    assert "yaml file(s)" in out
    doc = pyyaml.safe_load((tmp_path / "proj/models/marts/customers.yml").read_text())
    names = [c["name"] for c in doc["models"][0]["columns"]]
    assert "customer_id" in names
    # document fills descriptions via the deterministic backend
    assert _run(proj, tmp_path, "yaml", "document") == 0
    doc2 = pyyaml.safe_load((tmp_path / "proj/models/marts/customers.yml").read_text())
    descs = [c.get("description", "") for c in doc2["models"][0]["columns"]]
    assert all(descs)


def test_cli_lint_validate_diff_catalog_coverage(proj, tmp_path, capsys):
    _run(proj, tmp_path, "validate")
    out = capsys.readouterr().out
    assert "success" in out and "customers" in out

    _run(proj, tmp_path, "lint")
    capsys.readouterr()

    assert _run(proj, tmp_path, "diff", "customers") == 0
    d = json.loads(capsys.readouterr().out)
    assert d["model"] == "customers" and d["breaking"] is False

    out_path = tmp_path / "catalog.json"
    assert _run(proj, tmp_path, "catalog", "--out", str(out_path)) == 0
    capsys.readouterr()
    catalog = json.loads(out_path.read_text())
    assert "customers" in catalog["nodes"]

    assert _run(proj, tmp_path, "coverage") == 0
    assert "coverage:" in capsys.readouterr().out

    assert _run(proj, tmp_path, "test-suggest") == 0
    assert "customer_id" in capsys.readouterr().out


def test_cli_profile_and_export(proj, tmp_path, capsys):
    assert _run(proj, tmp_path, "profile", "customers") == 0
    out = capsys.readouterr().out
    assert "customers: 30 rows" in out and "customer_id" in out and "~distinct=" in out

    out_dir = tmp_path / "export_csv"
    assert _run(
        proj, tmp_path, "export", "customers", "--out", str(out_dir),
        "--format", "csv", "--single-file",
    ) == 0
    capsys.readouterr()
    files = list(out_dir.glob("*.csv"))
    assert len(files) == 1
    header = files[0].read_text().splitlines()[0]
    assert "customer_id" in header


def test_cli_explain(proj, tmp_path, capsys):
    assert _run(proj, tmp_path, "explain", "customers") == 0
    out = capsys.readouterr().out
    assert "shuffle exchanges:" in out and "codegen spans:" in out

    assert _run(
        proj, tmp_path, "explain",
        "select count(*) as n from {{ ref('customers') }}", "--full",
    ) == 0
    out = capsys.readouterr().out
    assert "HashAggregate" in out


def test_run_operation_renders_and_executes(tmp_path, capsys):
    """dbt run-operation analog: macro rendered with JSON kwargs; --execute
    runs the rendered SQL against the materialized project."""
    from dbt_osmosis_spark.cli import main

    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "macros").mkdir()
    (proj / "project.yml").write_text("name: opdemo\n")
    (proj / "models" / "base.sql").write_text("select 1 as x union all select 2 as x\n")
    (proj / "macros" / "ops.sql").write_text(
        "{% macro count_over(model, lo) %}"
        "select count(*) as n from {{ ref(model) }} where x > {{ lo }}"
        "{% endmacro %}\n"
    )
    rc = main(
        ["--project-dir", str(proj), "run-operation", "count_over",
         "--args", '{"model": "base", "lo": 1}']
    )
    out = capsys.readouterr().out
    assert rc == 0 and "select count(*) as n from base where x > 1" in out

    rc = main(
        ["--project-dir", str(proj), "--warehouse-dir", str(tmp_path / "wh"),
         "run-operation", "count_over", "--args", '{"model": "base", "lo": 1}',
         "--execute"]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "1" in out  # one row (x=2) qualifies


def test_sql_compile_with_vars_override(tmp_path, capsys):
    from dbt_osmosis_spark.cli import main

    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: varsdemo\nvars:\n  lo: 1\n")
    rc = main(
        ["--project-dir", str(proj), "sql", "compile",
         "select {{ var('lo') }} as lo", "--vars", '{"lo": 42}']
    )
    out = capsys.readouterr().out
    assert rc == 0 and "select 42 as lo" in out


def test_build_runs_models_and_tests(tmp_path, capsys):
    """dbt build analog: materialize + data tests + unit tests, exit code
    reflects failures."""
    from dbt_osmosis_spark.cli import main

    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: builddemo\n")
    (proj / "models" / "m.sql").write_text("select 1 as id union all select 2 as id\n")
    (proj / "models" / "m.yml").write_text(
        "models:\n- name: m\n  columns:\n  - name: id\n    tests: [unique, not_null]\n"
        "unit_tests:\n"
        "- name: m_is_identity\n  model: m\n  given: []\n"
        "  expect:\n    rows:\n    - {id: 1}\n    - {id: 2}\n"
    )
    rc = main(["--project-dir", str(proj), "--warehouse-dir", str(tmp_path / "wh"), "build"])
    out = capsys.readouterr().out
    assert rc == 0 and "build: ok" in out
    assert "test pass m.id: unique" in out and "unit pass m: m_is_identity" in out

    # break the data: duplicate id -> build fails
    (proj / "models" / "m.sql").write_text("select 1 as id union all select 1 as id\n")
    rc = main(["--project-dir", str(proj), "--warehouse-dir", str(tmp_path / "wh"), "build"])
    out = capsys.readouterr().out
    assert rc == 1 and "FAIL" in out


def test_cli_list_and_selectors(proj, tmp_path, capsys):
    from dbt_osmosis_spark.cli import main
    from dbt_osmosis_spark.project import load_project

    rc = main(["--project-dir", str(proj), "list"])
    out = capsys.readouterr().out
    assert rc == 0 and "model" in out

    m = load_project(proj)
    views = m.select(["config.materialized:view"])
    assert views == {n for n, nd in m.models.items() if nd.materialized == "view"}
    some = next(iter(m.models.values()))
    by_path = m.select([f"path:{some.path}"])
    assert some.name in by_path


def test_cli_run_continues_on_error_and_retry(proj, tmp_path, capsys):
    """dbt run semantics: a failing model records an error, dependents
    skip, siblings build; target/run_results.json (public schema) captures
    statuses; `retry` re-runs only the failed+skipped set and flips the
    artifact green once the model is fixed."""
    from pathlib import Path

    bad = Path(proj) / "models" / "bad_model.sql"
    bad.write_text("select nonexistent_column from {{ ref('stg_orders') }}\n")
    (Path(proj) / "models" / "bad_child.sql").write_text(
        "select * from {{ ref('bad_model') }}\n"
    )

    rc = _run(proj, tmp_path, "run")
    assert rc == 1
    out = capsys.readouterr().out
    assert "[ERROR]" in out and "[SKIPPED]" in out

    rr = json.loads((Path(proj) / "target" / "run_results.json").read_text())
    by_name = {e["relation_name"]: e["status"] for e in rr["results"]}
    assert by_name["bad_model"] == "error"
    assert by_name["bad_child"] == "skipped"
    assert by_name["customers"] == "success"  # sibling subtree unaffected

    # fix the model; retry runs ONLY the failed+skipped pair
    bad.write_text("select order_id from {{ ref('stg_orders') }}\n")
    rc = main(["--project-dir", proj, "--warehouse-dir", str(tmp_path / "wh"), "retry"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "retrying 2 node(s): bad_child, bad_model" in out
    rr2 = json.loads((Path(proj) / "target" / "run_results.json").read_text())
    by_name2 = {e["relation_name"]: e["status"] for e in rr2["results"]}
    assert by_name2["bad_model"] == "success"
    assert by_name2["bad_child"] == "success"
    # a second retry has nothing to do
    assert main(["--project-dir", proj, "retry"]) == 0
    assert "nothing to retry" in capsys.readouterr().out


def test_cli_retry_edge_cases(proj, tmp_path, capsys):
    """Retry resilience: out-of-selection dependents stay out of
    run_results; a deleted failed model is dropped from the retry set; a
    --fail-fast abort clears the stale artifact."""
    from pathlib import Path

    bad = Path(proj) / "models" / "bad_model.sql"
    bad.write_text("select nonexistent from {{ ref('stg_orders') }}\n")
    (Path(proj) / "models" / "bad_child.sql").write_text(
        "select * from {{ ref('bad_model') }}\n"
    )

    # selection-scoped run: bad_child is OUTSIDE --select, so it must not
    # appear in run_results at all (a retry must not rebuild unselected nodes)
    rc = _run(proj, tmp_path, "run", "--select", "bad_model")
    assert rc == 1
    capsys.readouterr()
    rr = json.loads((Path(proj) / "target" / "run_results.json").read_text())
    names = {e["relation_name"] for e in rr["results"]}
    assert "bad_model" in names and "bad_child" not in names

    # delete the broken model: retry drops it instead of crashing
    bad.unlink()
    rc = main(["--project-dir", proj, "--warehouse-dir", str(tmp_path / "wh"), "retry"])
    out = capsys.readouterr().out
    assert "ignoring 1 node(s) no longer in the project: bad_model" in out
    assert rc in (0, 1)

    # --fail-fast abort removes the stale artifact
    (Path(proj) / "models" / "bad_model.sql").write_text(
        "select nonexistent from {{ ref('stg_orders') }}\n"
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        _run(proj, tmp_path, "run", "--fail-fast")
    capsys.readouterr()
    assert not (Path(proj) / "target" / "run_results.json").exists()


def test_cli_yaml_flags(proj, tmp_path, capsys):
    """Reference yaml flags map to context settings: --dry-run touches
    nothing, --output-to-lower/--fusion-compat/--sort-by/
    --force-inherit-descriptions reach the transforms."""
    from pathlib import Path

    before = {p: p.read_text() for p in Path(proj).rglob("*.yml")}
    rc = _run(proj, tmp_path, "yaml", "sync", "--dry-run")
    out = capsys.readouterr().out
    assert rc == 0 and "would write" in out
    after = {p: p.read_text() for p in Path(proj).rglob("*.yml")}
    assert before == after, "--dry-run wrote files"

    rc = _run(proj, tmp_path, "yaml", "organize", "--dry-run")
    out = capsys.readouterr().out
    assert rc == 0 and "dry-run:" in out
    after = {p: p.read_text() for p in Path(proj).rglob("*.yml")}
    assert before == after, "organize --dry-run wrote files"

    # organize without --auto-apply previews; nothing applies
    rc = _run(proj, tmp_path, "yaml", "organize")
    out = capsys.readouterr().out
    assert rc == 0

    # sort-by alphabetical + output-to-lower + fusion-compat land in YAML
    rc = _run(
        proj, tmp_path, "yaml", "sync", "customers",
        "--sort-by", "alphabetical", "--output-to-lower",
    )
    assert rc == 0
    capsys.readouterr()
    doc = pyyaml.safe_load((Path(proj) / "models/marts/customers.yml").read_text())
    cols = doc["models"][0]["columns"]
    names = [c["name"] for c in cols]
    assert names == sorted(names), "--sort-by alphabetical not applied"
    assert all(n == n.lower() for n in names), "--output-to-lower not applied"
    types = [c["data_type"] for c in cols if c.get("data_type")]
    assert types and all(t == t.lower() for t in types)


def test_cli_yaml_model_scoped(proj, tmp_path, capsys):
    """Positional models scope the yaml pipeline: only the named model's
    sidecar is written; unknown names exit 2."""
    from pathlib import Path

    rc = _run(proj, tmp_path, "yaml", "sync", "customers")
    out = capsys.readouterr().out
    assert rc == 0 and "wrote 1 yaml file(s)" in out
    doc = pyyaml.safe_load((Path(proj) / "models/marts/customers.yml").read_text())
    assert any(c["name"] == "customer_id" for c in doc["models"][0]["columns"])

    rc = _run(proj, tmp_path, "yaml", "sync", "no_such_model")
    assert rc == 2
    assert "unknown model(s): no_such_model" in capsys.readouterr().err


def test_cli_docs_generate(proj, tmp_path, capsys):
    """docs generate writes both public artifacts; the manifest round-trips
    through the artifact loader."""
    from pathlib import Path

    from dbt_osmosis_spark.artifacts import load_manifest_json
    from dbt_osmosis_spark.project import load_project

    rc = _run(proj, tmp_path, "docs", "generate")
    out = capsys.readouterr().out
    assert rc == 0 and "manifest.json" in out and "catalog.json" in out
    target = Path(proj) / "target"
    assert (target / "manifest.json").is_file() and (target / "catalog.json").is_file()
    m1 = load_project(proj)
    m2 = load_manifest_json(target / "manifest.json", project_dir=proj)
    assert set(m2.models) == set(m1.models)
    cat = json.loads((target / "catalog.json").read_text())
    # public catalog schema: metadata header, nodes keyed by unique_id,
    # name-keyed column dicts with 1-based ordinals
    assert "dbt_schema_version" in cat["metadata"]
    uid = f"model.{m1.project_name}.customers"
    assert uid in cat["nodes"]
    cols = cat["nodes"][uid]["columns"]
    assert "customer_id" in cols and cols["customer_id"]["index"] >= 1


def test_build_continues_and_skips_tests_of_failed_models(tmp_path, capsys):
    """dbt build semantics: a broken model errors, its tests are not run,
    healthy models still build+test, run_results.json lands."""
    from pathlib import Path

    from dbt_osmosis_spark.cli import main

    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: builddemo\n")
    (proj / "models" / "good.sql").write_text("select 1 as id\n")
    (proj / "models" / "bad.sql").write_text("select oops from nonexistent_rel\n")
    (proj / "models" / "good.yml").write_text(
        "models:\n- name: good\n  columns:\n  - name: id\n    tests: [unique, not_null]\n"
        "- name: bad\n  columns:\n  - name: oops\n    tests: [not_null]\n"
    )
    rc = main(["--project-dir", str(proj), "--warehouse-dir", str(tmp_path / "wh"), "build"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "model bad: [ERROR]" in out
    assert "test pass good.id: unique" in out
    assert "bad.oops" not in out  # tests of the failed model skipped
    rr = json.loads((proj / "target" / "run_results.json").read_text())
    statuses = {e["relation_name"]: e["status"] for e in rr["results"]}
    assert statuses["bad"] == "error" and statuses["good"] == "success"


def test_cli_test_select(tmp_path, capsys):
    """dbt test --select: only the selected models' tests run."""
    from dbt_osmosis_spark.cli import main

    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: tsel\n")
    (proj / "models" / "a.sql").write_text("select 1 as id\n")
    (proj / "models" / "b.sql").write_text("select null as id\n")
    (proj / "models" / "a.yml").write_text(
        "models:\n- name: a\n  columns:\n  - name: id\n    tests: [not_null]\n"
    )
    (proj / "models" / "b.yml").write_text(
        "models:\n- name: b\n  columns:\n  - name: id\n    tests: [not_null]\n"
    )
    wh = str(tmp_path / "wh")
    rc = main(["--project-dir", str(proj), "--warehouse-dir", wh, "test", "--select", "a"])
    out = capsys.readouterr().out
    assert rc == 0 and "a.id" in out and "b.id" not in out
    rc = main(["--project-dir", str(proj), "--warehouse-dir", wh, "test"])
    out = capsys.readouterr().out
    assert rc == 1 and "b.id" in out  # unselected run includes the failing test


def test_cli_compile_writes_target_compiled(proj, tmp_path, capsys):
    from pathlib import Path

    rc = _run(proj, tmp_path, "compile")
    out = capsys.readouterr().out
    assert rc == 0 and "compiled" in out
    compiled = list((Path(proj) / "target" / "compiled").rglob("*.sql"))
    assert compiled
    text = "\n".join(p.read_text() for p in compiled)
    assert "{{" not in text and "ref(" not in text  # jinja fully rendered


def test_build_skips_unit_tests_of_failed_models_without_crash(tmp_path, capsys):
    """A failed model's unit test must be SKIPPED before execution (its
    compile raises the same error), and run_results.json still lands."""
    from pathlib import Path

    from dbt_osmosis_spark.cli import main

    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: bunit\n")
    (proj / "models" / "good.sql").write_text("select 1 as id\n")
    (proj / "models" / "bad.sql").write_text("select oops from nonexistent_rel\n")
    (proj / "models" / "bad.yml").write_text(
        "models:\n- name: bad\n"
        "unit_tests:\n- name: bad_unit\n  model: bad\n  given: []\n"
        "  expect:\n    rows:\n    - {oops: 1}\n"
    )
    rc = main(["--project-dir", str(proj), "--warehouse-dir", str(tmp_path / "wh"), "build"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "unit skip bad: bad_unit (model not built)" in out
    assert (proj / "target" / "run_results.json").is_file()
    assert "build: 1 failure(s)" in out


def test_compile_renders_this(proj, tmp_path, capsys):
    """{{ this }} compiles to the model's own relation, not empty."""
    from pathlib import Path

    (Path(proj) / "models" / "selfref.sql").write_text(
        "select '{{ this }}' as me\n"
    )
    rc = _run(proj, tmp_path, "compile")
    capsys.readouterr()
    assert rc == 0
    compiled = next((Path(proj) / "target" / "compiled").rglob("selfref.sql")).read_text()
    assert "''" not in compiled and "selfref" in compiled


def test_cli_generate_query_and_nl(proj, tmp_path, capsys):
    """generate query / nl query: NL -> schema-grounded SQL, --execute runs
    it (L3 CLI surface; reference cli/main.py:1215-1298,1451). Offline the
    deterministic backend emits the grounded template — no network key."""
    assert _run(proj, tmp_path, "generate", "query", "top customers by revenue") == 0
    out = capsys.readouterr().out
    assert "-- question: top customers by revenue" in out
    assert "ref('" in out

    assert (
        _run(proj, tmp_path, "generate", "query", "count all rows", "--execute") == 0
    )
    out = capsys.readouterr().out
    assert "ref('" in out and "limit 100" in out

    # nl query aliases generate query
    assert _run(proj, tmp_path, "nl", "query", "anything at all") == 0
    assert "-- question: anything at all" in capsys.readouterr().out


def test_cli_generate_model_writes_sql_and_yaml(proj, tmp_path, capsys):
    """generate model: NL -> model .sql + schema .yml, dry-run and
    overwrite guard (reference cli/main.py:839-976)."""
    assert (
        _run(proj, tmp_path, "generate", "model", "churned customers last month",
             "--dry-run") == 0
    )
    out = capsys.readouterr().out
    assert "would write" in out and "churned" in out

    assert _run(proj, tmp_path, "generate", "model", "churned customers last month") == 0
    capsys.readouterr()
    sql_path = tmp_path / "proj/models/nl_churned_customers_last_month.sql"
    yml_path = tmp_path / "proj/models/nl_churned_customers_last_month.yml"
    assert sql_path.exists() and "select" in sql_path.read_text()
    doc = pyyaml.safe_load(yml_path.read_text())
    assert doc["models"][0]["name"] == "nl_churned_customers_last_month"

    # overwrite guard on the YAML
    assert _run(proj, tmp_path, "generate", "model", "churned customers last month") == 1
    assert "refusing to overwrite" in capsys.readouterr().out
    assert (
        _run(proj, tmp_path, "generate", "model", "churned customers last month",
             "--overwrite") == 0
    )
    capsys.readouterr()

    # guard also fires when the .sql exists but the .yml does not (ADVICE
    # r4: deleting the yml, or pointing --schema-yml elsewhere, must not
    # silently clobber the model SQL)
    yml_path.unlink()
    assert _run(proj, tmp_path, "generate", "model", "churned customers last month") == 1
    out = capsys.readouterr().out
    assert "refusing to overwrite" in out and str(sql_path) in out
    assert (
        _run(proj, tmp_path, "generate", "model", "churned customers last month",
             "--overwrite") == 0
    )
    capsys.readouterr()
    assert yml_path.exists()

    # nl generate = deprecated alias of generate model
    assert (
        _run(proj, tmp_path, "nl", "generate", "weekly actives", "--model-name",
             "weekly_actives") == 0
    )
    capsys.readouterr()
    assert (tmp_path / "proj/models/weekly_actives.sql").exists()


def test_cli_generate_staging_and_sources(proj, tmp_path, capsys):
    """generate staging SOURCE TABLE -> stg model + YAML from live columns;
    generate sources -> bootstrap sources.yml (L4/L5 CLI surface;
    reference cli/main.py:978-1213)."""
    assert (
        _run(proj, tmp_path, "generate", "staging", "analytics", "events",
             "--dry-run") == 0
    )
    out = capsys.readouterr().out
    assert "would write" in out and "source('analytics', 'events')" in out

    assert _run(proj, tmp_path, "generate", "staging", "analytics", "events") == 0
    capsys.readouterr()
    stg_sql = tmp_path / "proj/models/staging/stg_events.sql"
    stg_yml = tmp_path / "proj/models/staging/stg_events.yml"
    assert stg_sql.exists()
    body = stg_sql.read_text()
    assert "from {{ source('analytics', 'events') }}" in body
    doc = pyyaml.safe_load(stg_yml.read_text())
    cols = [c["name"] for c in doc["models"][0]["columns"]]
    assert "event_id" in cols or len(cols) > 0

    assert _run(proj, tmp_path, "generate", "sources", "--dry-run") == 0
    capsys.readouterr()
    assert _run(proj, tmp_path, "generate", "sources") == 0
    out = capsys.readouterr().out
    assert "created source" in out or "already covered" in out
