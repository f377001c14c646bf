"""Command-line interface — the reference's CLI surface on Spark.

Mirrors the dbt-osmosis command tree (reference: src/dbt_osmosis/cli/main.py)
with Spark as the engine:

    python -m dbt_osmosis_spark run        --project-dir DIR   # dbt run analog
    python -m dbt_osmosis_spark sql run "select ... {{ ref('x') }}"
    python -m dbt_osmosis_spark sql compile "..."
    python -m dbt_osmosis_spark yaml refactor|organize|document|sync
    python -m dbt_osmosis_spark lint       [model ...]
    python -m dbt_osmosis_spark validate   [model ...]
    python -m dbt_osmosis_spark diff MODEL
    python -m dbt_osmosis_spark catalog    --out PATH
    python -m dbt_osmosis_spark coverage / test-suggest

Row display caps mirror the reference (50 rows for `sql run`,
reference: src/dbt_osmosis/cli/main.py:1650-1656).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path as _Path

PRINT_CAP = 50


def _load_manifest(args):
    """Project loading switch: a standard project directory by default, or a
    pre-parsed public dbt artifact (target/manifest.json) via --manifest —
    the hand-off path for users arriving from dbt-core with no project
    source tree mounted (reference consumes the live equivalent at
    src/dbt_osmosis/core/config.py:437-453)."""
    mf = getattr(args, "manifest", None)
    if mf:
        import json as _json

        from dbt_osmosis_spark.artifacts import load_manifest_json

        vars_ = _json.loads(args.vars) if getattr(args, "vars", None) else None
        # only pin project_dir when the user passed --project-dir; otherwise
        # let the loader's artifact-relative fallback (manifest's target/..)
        # resolve relative seed/source paths — the artifact knows its
        # project root, the caller's CWD does not
        pin = args.project_dir if getattr(args, "explicit_project_dir", True) else None
        m = load_manifest_json(mf, vars=vars_, project_dir=pin)
        # --target applies on this path too (the artifact carries no
        # profile, so there is no default to read; --profiles-dir is only
        # meaningful when parsing a project tree)
        if getattr(args, "target", None):
            m.target = args.target
        return m
    from dbt_osmosis_spark.project import load_project

    return load_project(
        args.project_dir,
        profiles_dir=getattr(args, "profiles_dir", None),
        target=getattr(args, "target", None),
    )


def _build_context(args, need_spark: bool = True, read_only: bool = True):
    """Load the manifest and register the DAG. Defaults to read-only
    registration (no warehouse writes, no hooks) — test/profile/yaml/sql/
    lineage commands must not re-execute incremental or snapshot
    materializations (dbt's test and docs commands never write). Only
    `build` passes read_only=False."""
    from dbt_osmosis_spark.runner import materialize
    from dbt_osmosis_spark.session import get_spark

    manifest = _load_manifest(args)
    spark = None
    if need_spark:
        spark = get_spark(app_name="dbt-osmosis-spark-cli")
        materialize(spark, manifest, warehouse_dir=args.warehouse_dir, read_only=read_only)
    return spark, manifest


def _write_run_results(args, manifest, report, elapsed: float) -> None:
    """dbt writes target/run_results.json after every run; CI and `retry`
    consume it (public schema, artifacts.write_run_results)."""
    from dbt_osmosis_spark.artifacts import write_run_results

    out = _Path(args.project_dir) / "target" / "run_results.json"
    write_run_results(manifest, report.results, out, elapsed=round(elapsed, 3))
    print(f"run results written: {out}")


def cmd_run(args) -> int:
    from dbt_osmosis_spark.runner import materialize
    from dbt_osmosis_spark.session import get_spark

    manifest = _load_manifest(args)
    if getattr(args, "vars", None):
        import json

        # dbt --vars: CLI overrides project vars for this invocation
        manifest.vars = {**manifest.vars, **json.loads(args.vars)}
    spark = get_spark(app_name="dbt-osmosis-spark-cli")
    previous_state = None
    if getattr(args, "state", None):
        from dbt_osmosis_spark.state import load_state

        previous_state = load_state(args.state)
    import time as _time

    t0 = _time.perf_counter()
    try:
        report = materialize(
            spark,
            manifest,
            warehouse_dir=args.warehouse_dir,
            count_rows=True,
            select=getattr(args, "select", None),
            exclude=getattr(args, "exclude", None),
            previous_state=previous_state,
            threads=getattr(args, "threads", 1),
            full_refresh=getattr(args, "full_refresh", False),
            # dbt default: model failures don't abort the run; dependents skip
            on_error="raise" if getattr(args, "fail_fast", False) else "continue",
        )
    except Exception:
        # --fail-fast abort: no report exists, so remove the previous run's
        # artifact — a later `retry` must not act on stale statuses that
        # predate this failure
        (_Path(args.project_dir) / "target" / "run_results.json").unlink(missing_ok=True)
        raise
    for r in report.results:
        rows = "" if r.rows is None else f"  rows={r.rows}"
        flag = "" if r.status == "success" else f"  [{r.status.upper()}] {r.error}"
        print(f"{r.kind:7s} {r.name:30s} {r.materialized}{rows}{flag}")
    _write_run_results(args, manifest, report, _time.perf_counter() - t0)
    if getattr(args, "write_state", None):
        from dbt_osmosis_spark.state import write_state

        print(f"state written: {write_state(manifest, args.write_state)}")
    return 0 if report.ok else 1


def cmd_sql(args) -> int:
    from dbt_osmosis_spark.sql_ops import compile_sql_code, execute_sql_code

    import json

    extra_vars = json.loads(args.vars) if getattr(args, "vars", None) else None
    if args.action == "compile":
        _, manifest = _build_context(args, need_spark=False)
        print(compile_sql_code(manifest, args.sql, extra_vars).compiled_sql)
        return 0
    spark, manifest = _build_context(args)
    _, df = execute_sql_code(spark, manifest, args.sql, extra_vars)
    df.show(PRINT_CAP, truncate=False)
    return 0


def cmd_yaml(args) -> int:
    from dbt_osmosis_spark.llm import synthesize_missing_documentation
    from dbt_osmosis_spark.path_management import create_missing_source_yamls
    from dbt_osmosis_spark.restructuring import (
        apply_restructure_plan,
        draft_restructure_plan,
    )
    from dbt_osmosis_spark.transforms import (
        YamlRefactorContext,
        inherit_upstream_column_knowledge,
        inject_missing_columns,
        load_docs_from_yaml,
        remove_columns_not_in_database,
        sort_columns_alphabetically,
        sort_columns_as_in_database,
        sync_to_yaml,
        synchronize_data_types,
    )

    if args.action == "check-schemas":
        from dbt_osmosis_spark.schema_validation import validate_project_schemas

        findings = validate_project_schemas(args.project_dir)
        n_err = 0
        for rel, violations in sorted(findings.items()):
            for v in violations:
                if v.severity == "error":
                    n_err += 1
                print(f"{rel}: {v.severity.upper()} [{v.code}] {v.path}: {v.message}")
        print(f"{sum(len(v) for v in findings.values())} finding(s), {n_err} error(s)")
        return 1 if n_err else 0

    # CLI flags become explicit context settings — the top tier of the
    # resolution chain (explicit > dbt-osmosis.yml > project vars)
    settings = {
        name: True
        for name in ("force_inherit_descriptions", "output_to_lower", "fusion_compat")
        if getattr(args, name, False)
    }
    if getattr(args, "sort_by", None):
        settings["sort_by"] = args.sort_by
    dry_run = bool(getattr(args, "dry_run", False))

    spark, manifest = _build_context(args)
    ctx = YamlRefactorContext(
        spark=spark, manifest=manifest, project_dir=args.project_dir, settings=settings
    )
    load_docs_from_yaml(ctx)

    if args.action == "organize":
        created = create_missing_source_yamls(
            spark, manifest, args.project_dir, dry_run=dry_run
        )
        if created.created:
            verb = "would bootstrap" if dry_run else "bootstrapped"
            print(f"{verb} sources: {', '.join(created.created)}")
        plan = draft_restructure_plan(manifest, args.project_dir)
        for op in plan.operations:
            print(f"plan: {op.describe()}")
        if dry_run:
            print(f"dry-run: {len(plan.operations)} operation(s), nothing written")
            return 0
        # reference semantics: the plan applies only under --auto-apply
        # (interactive confirmation is the reference's other path; this CLI
        # is non-interactive, so preview is the default)
        if plan.operations and not getattr(args, "auto_apply", False):
            print(
                f"{len(plan.operations)} operation(s) planned; "
                "pass --auto-apply to apply them"
            )
            return 0
        written = apply_restructure_plan(plan, ctx.yaml)
        print(f"organized {len(written)} yaml file(s)")
        return 0

    # positional models scope the whole pipeline (the reference's
    # per-model yaml invocation); default is every non-ephemeral node.
    # Ephemeral models never become relations (no columns to introspect) —
    # the unscoped path excludes them, so the scoped path must too.
    targets = list(dict.fromkeys(getattr(args, "models", None) or []))
    unknown = [m for m in targets if m not in manifest.models]
    if unknown:
        print(f"unknown model(s): {', '.join(unknown)}", file=sys.stderr)
        return 2
    ephemeral = [
        m for m in targets if manifest.models[m].materialized == "ephemeral"
    ]
    if ephemeral:
        print(
            f"skipping ephemeral model(s) (no relation to introspect): "
            f"{', '.join(ephemeral)}"
        )
        targets = [m for m in targets if m not in ephemeral]
        if not targets:
            return 0

    sort_step = (
        sort_columns_alphabetically
        if settings.get("sort_by") == "alphabetical"
        else sort_columns_as_in_database
    )
    pipeline = (
        inject_missing_columns
        >> remove_columns_not_in_database
        >> inherit_upstream_column_knowledge
        >> sort_step
        >> synchronize_data_types
    )
    if targets:
        for m in targets:
            pipeline(ctx, m)
    else:
        pipeline(ctx)
    if args.action == "document":
        order = [m for m in manifest.topo_sort() if not targets or m in targets]
        report = synthesize_missing_documentation(ctx.columns_of, order)
        print(
            f"documented {len(report.described)} column(s) "
            f"({report.bulk_calls} bulk / {report.single_calls} single calls)"
        )
    if targets:
        written = []
        for m in targets:
            for p in sync_to_yaml(ctx, node=m, dry_run=dry_run):
                if p not in written:  # versioned models share a sidecar
                    written.append(p)
    else:
        written = sync_to_yaml(ctx, dry_run=dry_run)
    verb = "would write" if dry_run else "wrote"
    print(f"{verb} {len(written)} yaml file(s)")
    if args.check and ctx.mutated:
        print("--check: project yaml out of date", file=sys.stderr)
        return 1
    return 0


def cmd_lint(args) -> int:
    from dbt_osmosis_spark.lint import lint_project

    _, manifest = _build_context(args, need_spark=False)
    findings = lint_project(manifest)
    n = 0
    for model, items in sorted(findings.items()):
        if args.models and model not in args.models:
            continue
        for f in items:
            n += 1
            print(f"{model}: [{f.rule}] {f.message}")
    print(f"{n} finding(s)")
    return 0 if n == 0 else 1


def cmd_validate(args) -> int:
    from dbt_osmosis_spark.validation import validate_model, validate_models

    spark, manifest = _build_context(args)
    if args.models:
        results = [validate_model(spark, manifest, m) for m in args.models]
    else:
        results = validate_models(spark, manifest)
    bad = 0
    for r in results:
        bad += 0 if r.status == "success" else 1
        print(f"{r.status:7s} {r.model:30s} rows={r.row_count} {r.seconds:.2f}s {r.error or ''}")
    return 0 if bad == 0 else 1


def cmd_diff(args) -> int:
    from dbt_osmosis_spark.diff import diff_columns
    from dbt_osmosis_spark.introspect import get_columns
    from dbt_osmosis_spark.transforms import YamlRefactorContext, load_docs_from_yaml

    spark, manifest = _build_context(args)
    ctx = YamlRefactorContext(spark=spark, manifest=manifest, project_dir=args.project_dir)
    load_docs_from_yaml(ctx)
    yaml_cols = {
        name: meta.get("data_type") for name, meta in ctx.columns_of[args.model].items()
    }
    from dbt_osmosis_spark.compile import relation_name

    db_cols = {c.name: c.data_type for c in get_columns(spark, relation_name(args.model))}
    d = diff_columns(args.model, yaml_cols, db_cols)
    print(json.dumps(
        {
            "model": d.model,
            "changes": [
                {"kind": c.kind, "column": c.column, "old": c.old, "new": c.new,
                 "severity": c.severity.name}
                for c in d.changes
            ],
            "breaking": d.breaking,
        },
        indent=2,
    ))
    return 0


def cmd_catalog(args) -> int:
    from dbt_osmosis_spark.introspect import write_catalog

    spark, _ = _build_context(args)
    catalog = write_catalog(spark, args.out)
    print(f"wrote {args.out} ({len(catalog['nodes'])} relations)")
    return 0


def cmd_docs(args) -> int:
    """`dbt docs generate` analog: write BOTH public artifacts —
    target/manifest.json (the parsed project) and target/catalog.json
    (introspected relations) — so downstream dbt tooling (docs sites,
    lineage viewers, dbt-osmosis itself) can consume this engine's
    output unchanged."""
    from dbt_osmosis_spark.artifacts import write_catalog_json, write_manifest_json

    spark, manifest = _build_context(args)
    target_dir = _Path(args.project_dir) / "target"
    mpath = write_manifest_json(
        manifest, target_dir / "manifest.json", project_dir=args.project_dir
    )
    catalog = write_catalog_json(manifest, spark, target_dir / "catalog.json")
    print(f"wrote {mpath}")
    print(f"wrote {target_dir / 'catalog.json'} ({len(catalog['nodes'])} nodes)")
    return 0


def cmd_coverage(args) -> int:
    from dbt_osmosis_spark.suggestions import coverage_stats, find_documentation_gaps
    from dbt_osmosis_spark.transforms import YamlRefactorContext, load_docs_from_yaml

    spark, manifest = _build_context(args)
    ctx = YamlRefactorContext(spark=spark, manifest=manifest, project_dir=args.project_dir)
    load_docs_from_yaml(ctx)
    stats = coverage_stats(ctx.columns_of)
    print(f"coverage: {stats.documented}/{stats.total_columns} ({stats.pct:.1f}%)")
    for node, priority, cols in find_documentation_gaps(manifest, ctx.columns_of):
        print(f"  gap p={priority:.1f} {node}: {', '.join(cols)}")
    return 0


def cmd_test_suggest(args) -> int:
    from dbt_osmosis_spark.suggestions import suggest_tests
    from dbt_osmosis_spark.transforms import YamlRefactorContext, load_docs_from_yaml

    spark, manifest = _build_context(args)
    ctx = YamlRefactorContext(spark=spark, manifest=manifest, project_dir=args.project_dir)
    load_docs_from_yaml(ctx)
    from dbt_osmosis_spark.transforms import inject_missing_columns

    inject_missing_columns(ctx)
    for s in suggest_tests(ctx.columns_of):
        print(f"{s.node}.{s.column}: {s.test} (confidence {s.confidence}, {s.reason})")
    return 0


def cmd_test(args) -> int:
    from dbt_osmosis_spark.datatests import run_project_tests
    from dbt_osmosis_spark.transforms import YamlRefactorContext

    spark, manifest = _build_context(args)
    ctx = YamlRefactorContext(spark=spark, manifest=manifest, project_dir=args.project_dir)
    skip: set[str] | None = None
    if getattr(args, "select", None):
        # dbt test --select: only the selected models' tests run
        # (state:modified/state:new need --state, like run)
        previous_state = None
        if getattr(args, "state", None):
            from dbt_osmosis_spark.state import load_state

            previous_state = load_state(args.state)
        selected = manifest.select(args.select, previous_state)
        skip = set(manifest.models) - selected
    results = run_project_tests(
        spark,
        ctx,
        store_failures_dir=getattr(args, "store_failures", None),
        skip_models=skip,
    )
    failed = 0
    for r in results:
        status = {"pass": "pass", "warn": "WARN", "fail": "FAIL", "error": "ERR "}[r.status]
        failed += 0 if r.passed else 1
        where = f"{r.model}.{r.column}" if r.column else r.model
        if r.status == "error":
            extra = f" {r.message}"
        elif r.status != "pass":
            extra = f" violations={r.violations} sample={r.sample}"
        else:
            extra = ""
        print(f"{status:4s} {where}: {r.test}{extra}")
    print(f"{len(results) - failed}/{len(results)} tests passed")
    return 0 if failed == 0 else 1


def cmd_compile(args) -> int:
    """`dbt compile` analog: render every SQL model's Jinja to
    target/compiled/<project>/<model path> — the debugging artifact dbt
    users diff and paste into consoles. Pure text stage; no Spark session,
    no warehouse reads."""
    from dbt_osmosis_spark.compile import JinjaCompiler, relation_name

    manifest = _load_manifest(args)
    compiler = JinjaCompiler(manifest)
    out_root = _Path(args.project_dir) / "target" / "compiled" / manifest.project_name
    n = 0
    for name in manifest.topo_sort():
        node = manifest.models[name]
        if node.language != "sql":
            continue
        # {{ this }} resolves to the model's own relation (the runner does
        # the same at materialization time)
        compiled = compiler.compile(node.raw_sql, this=relation_name(name)).compiled_sql
        out = out_root / node.path
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(compiled + "\n")
        n += 1
    print(f"compiled {n} model(s) under {out_root}")
    return 0


def cmd_list(args) -> int:
    """`dbt ls` analog: enumerate nodes, optionally narrowed by the same
    selector syntax `run --select` takes (name+/+name/tag:/path:/
    config.materialized:/state:modified)."""
    _, manifest = _build_context(args, need_spark=False)
    selected = None
    if args.select:
        selected = manifest.select(args.select)
    if selected is None:
        # selectors address models only; sources/seeds list on the
        # unfiltered enumeration
        for key in sorted(manifest.sources):
            print(f"source  {key}")
        for name in sorted(manifest.seeds):
            print(f"seed    {name}")
    for name in manifest.topo_sort():
        if selected is not None and name not in selected:
            continue
        node = manifest.models[name]
        tags = f"  tags={','.join(node.tags)}" if node.tags else ""
        print(f"model   {name:30s} {node.materialized}{tags}")
    return 0


def cmd_serve(args) -> int:
    """Wire server (M34): SQL over TCP mounted on the serving session
    (ref()-aware compile, DDL-comment intercept, schema op). Two codecs
    over the same protocol-agnostic SqlSession: the native MySQL
    client/server protocol (default — any stock MySQL client connects,
    like the reference's sql/proxy.py:174-179) or newline-delimited JSON
    (--protocol json). Real deployments front Spark Connect / Thrift."""
    if args.protocol == "mysql":
        from dbt_osmosis_spark.mysql_wire import serve_mysql as _serve
    else:
        from dbt_osmosis_spark.serving import serve_wire as _serve

    spark, manifest = _build_context(args)
    srv = _serve(spark, manifest, host=args.host, port=args.port)
    print(
        f"serving {args.protocol} on "
        f"{srv.server_address[0]}:{srv.server_address[1]}"
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        srv.server_close()
    return 0


def cmd_profile(args) -> int:
    from dbt_osmosis_spark.compile import relation_name
    from dbt_osmosis_spark.profile import profile

    spark, _ = _build_context(args)
    prof = profile(spark.table(relation_name(args.model)), args.model)
    print(f"{prof.relation}: {prof.n_rows} rows")
    for c in prof.columns:
        bits = [f"nulls={c.nulls}", f"~distinct={c.approx_distinct}"]
        if c.mean is not None:
            bits.append(f"mean={c.mean:.4g} std={(c.stddev or 0):.4g}")
        if c.min is not None:
            bits.append(f"range=[{c.min}, {c.max}]")
        if c.avg_length is not None:
            bits.append(f"avg_len={c.avg_length:.1f}")
        print(f"  {c.name:24s} {c.data_type:12s} {' '.join(bits)}")
    return 0


def cmd_export(args) -> int:
    from dbt_osmosis_spark.compile import relation_name

    spark, _ = _build_context(args)
    df = spark.table(relation_name(args.model))
    writer = df.coalesce(1) if args.single_file else df
    w = writer.write.mode("overwrite")
    if args.format == "csv":
        w.option("header", True).csv(args.out)
    elif args.format == "json":
        w.json(args.out)
    elif args.format == "orc":
        w.orc(args.out)
    else:
        w.parquet(args.out)
    print(f"exported {args.model} -> {args.out} ({args.format})")
    return 0


def cmd_explain(args) -> int:
    """Physical-plan audit for a model or ad-hoc SQL: the scale levers
    (broadcasts, shuffles, codegen spans, pushdown, partition pruning) as a
    one-screen summary above the formatted plan."""
    from dbt_osmosis_spark.compile import relation_name
    from dbt_osmosis_spark.plans.audit import (
        exchange_count,
        formatted_plan,
        has_broadcast_join,
        has_cartesian,
        partition_filters,
        pushed_filters,
        scan_schemas,
        uses_top_k,
        whole_stage_codegen_spans,
    )
    from dbt_osmosis_spark.sql_ops import execute_sql_code

    spark, manifest = _build_context(args)
    if args.model_or_sql.lstrip().lower().startswith(("select", "with")) or "{{" in args.model_or_sql:
        _, df = execute_sql_code(spark, manifest, args.model_or_sql)
    else:
        df = spark.table(relation_name(args.model_or_sql))
    print(f"shuffle exchanges:  {exchange_count(df)}")
    print(f"codegen spans:      {whole_stage_codegen_spans(df)}")
    print(f"broadcast join:     {has_broadcast_join(df)}")
    print(f"cartesian product:  {has_cartesian(df)}")
    print(f"top-k (no sort):    {uses_top_k(df)}")
    print(f"pushed filters:     {pushed_filters(df) or '-'}")
    print(f"partition filters:  {partition_filters(df) or '-'}")
    print(f"scan schemas:       {scan_schemas(df) or '-'}")
    if args.full:
        print()
        print(formatted_plan(df))
    return 0


def cmd_run_operation(args) -> int:
    """`dbt run-operation` analog: render a project macro standalone
    (--args as a JSON object of kwargs); with --execute, run the rendered
    SQL on Spark and print up to 50 rows."""
    import json

    from dbt_osmosis_spark.compile import JinjaCompiler

    kwargs = json.loads(args.args)
    call = ", ".join(f"{k}={v!r}" for k, v in kwargs.items())
    template = f"{{{{ {args.macro}({call}) }}}}"
    if args.execute:
        spark, manifest = _build_context(args)
    else:
        manifest = _load_manifest(args)
    rendered = JinjaCompiler(manifest).compile(template).compiled_sql
    if args.execute and rendered.strip():
        spark.sql(rendered).show(PRINT_CAP, truncate=False)
    else:
        print(rendered)
    return 0


def cmd_source_freshness(args) -> int:
    """`dbt source freshness` analog: MAX(loaded_at) per configured source
    (parquet aggregate pushdown — footer stats, no data scan) vs
    warn_after/error_after; exit 1 on any error status."""
    from dbt_osmosis_spark.freshness import check_freshness
    from dbt_osmosis_spark.session import get_spark

    manifest = _load_manifest(args)
    spark = get_spark(app_name="dbt-osmosis-spark-cli")
    results = check_freshness(spark, manifest)
    if not results:
        print("no sources carry a freshness config")
        return 0
    worst = 0
    for r in results:
        age = "-" if r.age_seconds is None else f"{r.age_seconds / 3600.0:.2f}h"
        print(f"{r.status.upper():5s} {r.source:30s} max={r.max_loaded_at} age={age}")
        if r.status == "error":
            worst = 1
    return worst


def cmd_build(args) -> int:
    """`dbt build` analog: materialize everything (seeds, models,
    snapshots, incrementals) then run declared data tests and unit tests;
    exit 1 on any failure. Model-failure semantics follow dbt build: a
    model failure records an error, its dependents skip, the rest keeps
    building, tests of failed/skipped models are not run, and the public
    target/run_results.json is written. Known delta vs dbt: dbt
    interleaves tests into the DAG so a TEST failure also blocks
    downstream BUILDS; here all selected models materialize first and
    tests run after, so a failed test reports but does not un-build
    dependents."""
    import time as _time

    from dbt_osmosis_spark.datatests import run_project_tests
    from dbt_osmosis_spark.runner import materialize
    from dbt_osmosis_spark.session import get_spark
    from dbt_osmosis_spark.transforms import YamlRefactorContext
    from dbt_osmosis_spark.unittests import run_unit_tests_from_doc

    manifest = _load_manifest(args)
    spark = get_spark(app_name="dbt-osmosis-spark-cli")
    t0 = _time.perf_counter()
    report = materialize(
        spark,
        manifest,
        warehouse_dir=args.warehouse_dir,
        on_error="continue",
    )
    bad_models = {r.name for r in report.results if r.status != "success"}
    n_errors = sum(1 for r in report.results if r.status == "error")
    n_skipped = sum(1 for r in report.results if r.status == "skipped")
    for r in report.results:
        if r.status != "success":
            print(f"model {r.name}: [{r.status.upper()}] {r.error}")
    ctx = YamlRefactorContext(spark=spark, manifest=manifest, project_dir=args.project_dir)
    # dbt counts errors as failures; skipped dependents report separately
    failed = n_errors
    for r in run_project_tests(spark, ctx, skip_models=bad_models):
        status = "pass" if r.passed else "FAIL"
        failed += 0 if r.passed else 1
        where = f"{r.model}.{r.column}" if r.column else r.model
        print(f"test {status:4s} {where}: {r.test}")
    from pathlib import Path

    for f in sorted(Path(args.project_dir).rglob("*.yml")):
        doc = ctx.yaml.read(f)
        specs = (doc or {}).get("unit_tests") or []
        if not specs:
            continue
        # filter BEFORE running: a unit test compiles the model's SQL, so
        # a failed model's test would raise the same error uncaught
        kept = []
        for spec in specs:
            if spec.get("model") in bad_models:
                print(f"unit skip {spec.get('model')}: {spec.get('name')} (model not built)")
            else:
                kept.append(spec)
        for u in run_unit_tests_from_doc(spark, manifest, {"unit_tests": kept}):
            status = "pass" if u.passed else "FAIL"
            failed += 0 if u.passed else 1
            print(f"unit {status:4s} {u.model}: {u.name}" + ("" if u.passed else f" — {u.message}"))
    _write_run_results(args, manifest, report, _time.perf_counter() - t0)
    skipnote = f", {n_skipped} skipped" if n_skipped else ""
    print(f"build: {'ok' if not failed else f'{failed} failure(s)'}{skipnote}")
    return 1 if failed else 0


def cmd_lineage(args) -> int:
    """Column-level lineage from Catalyst pruning (no jobs run): which
    source columns can affect each output column of a model."""
    from dbt_osmosis_spark.lineage import column_lineage, model_lineage, register_views
    from dbt_osmosis_spark.session import get_spark

    manifest = _load_manifest(args)
    spark = get_spark(app_name="dbt-osmosis-spark-cli")
    register_views(spark, manifest)
    if args.column:
        lin = {args.column: column_lineage(spark, manifest, args.model, args.column)}
    else:
        lin = model_lineage(spark, manifest, args.model)
    for col, deps in lin.items():
        print(f"{args.model}.{col}")
        for src, cols in deps.items():
            print(f"  <- {src}: {', '.join(cols)}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dbt-osmosis-spark")
    # default=None so --manifest can tell "user pinned a project dir" apart
    # from "CWD fallback": load_manifest_json's artifact-relative resolution
    # (target/..) must win when --project-dir was not given. main() rewrites
    # None -> "." after recording explicitness.
    p.add_argument("--project-dir", default=None, help="project directory (default: .)")
    p.add_argument("--manifest", default=None, help="load a pre-parsed public dbt target/manifest.json instead of parsing --project-dir")
    p.add_argument(
        "--profiles-dir",
        default=None,
        help="directory holding profiles.yml (dbt --profiles-dir; default: the project dir)",
    )
    p.add_argument(
        "--target", default=None, help="profile target to record (dbt --target)"
    )
    p.add_argument("--warehouse-dir", default="/tmp/dbt_osmosis_spark_warehouse")
    sub = p.add_subparsers(dest="command", required=True)

    rp = sub.add_parser("run", help="materialize all models (dbt run analog)")
    rp.add_argument(
        "--select",
        nargs="+",
        default=None,
        help="dbt-style selectors: name, name+, +name, tag:x, state:modified[+]",
    )
    rp.add_argument(
        "--exclude",
        nargs="+",
        default=None,
        help="dbt-style selectors to subtract from the selection",
    )
    rp.add_argument("--state", default=None, help="state dir/file for state:modified")
    rp.add_argument("--vars", default=None, help="JSON object overriding project vars")
    rp.add_argument("--threads", type=int, default=1, help="dbt threads: layer-parallel model builds")
    rp.add_argument(
        "--full-refresh", action="store_true", help="rebuild incremental models from scratch"
    )
    rp.add_argument(
        "--write-state", default=None, help="write state.json fingerprints to this dir after the run"
    )
    rp.add_argument(
        "--fail-fast",
        action="store_true",
        help="abort on the first model failure (default: record error, skip dependents, keep building)",
    )

    ryp = sub.add_parser(
        "retry", help="re-run the models that errored/skipped in the last run (dbt retry analog)"
    )
    ryp.add_argument("--vars", default=None, help="JSON object overriding project vars")
    ryp.add_argument("--threads", type=int, default=1)
    ryp.add_argument("--fail-fast", action="store_true")

    sp = sub.add_parser("sql", help="compile/execute ad-hoc jinja-SQL")
    sp.add_argument("action", choices=["run", "compile"])
    sp.add_argument("sql")
    sp.add_argument("--vars", default=None, help="JSON object overriding project vars")

    yp = sub.add_parser("yaml", help="yaml pipeline: refactor/organize/document/sync")
    yp.add_argument(
        "action", choices=["refactor", "organize", "document", "sync", "check-schemas"]
    )
    yp.add_argument(
        "models", nargs="*", help="scope the pipeline to these models (default: all)"
    )
    yp.add_argument("--check", action="store_true", help="exit 1 if anything mutated")
    # the reference's yaml flags (src/dbt_osmosis/cli/main.py) — each maps
    # to a context setting the transform/settings chain already resolves
    yp.add_argument("--dry-run", action="store_true", help="report would-be writes, touch nothing")
    yp.add_argument(
        "--force-inherit-descriptions",
        action="store_true",
        help="overwrite existing child descriptions with ancestors'",
    )
    yp.add_argument(
        "--output-to-lower",
        action="store_true",
        help="lowercase column names and data types in the written YAML",
    )
    yp.add_argument(
        "--fusion-compat",
        action="store_true",
        help="nest column meta/tags under config: (dbt-fusion layout)",
    )
    yp.add_argument(
        "--sort-by",
        choices=["database", "alphabetical"],
        default=None,
        help="column ordering for the sort transform",
    )
    yp.add_argument(
        "--auto-apply",
        action="store_true",
        help="organize: apply the restructure plan (default: preview only)",
    )

    lp = sub.add_parser("lint", help="lint model SQL")
    lp.add_argument("models", nargs="*")

    vp = sub.add_parser("validate", help="dry-run models, report rows/timing")
    vp.add_argument("models", nargs="*")

    dp = sub.add_parser("diff", help="yaml-vs-live schema diff for a model")
    dp.add_argument("model")

    dg = sub.add_parser("docs", help="dbt docs generate analog: write target/manifest.json + catalog.json")
    dg.add_argument("action", choices=["generate"])

    cp = sub.add_parser("catalog", help="write catalog.json artifact")
    cp.add_argument("--out", default="catalog.json")

    sub.add_parser("coverage", help="documentation coverage + gaps")
    sub.add_parser("test-suggest", help="suggest column tests")
    tp = sub.add_parser("test", help="run declared YAML data tests (dbt test analog)")
    tp.add_argument(
        "--store-failures",
        default=None,
        help="dir to persist each failing test's violating rows as parquet",
    )
    tp.add_argument(
        "--select",
        nargs="+",
        default=None,
        help="dbt-style selectors: only the selected models' tests run",
    )
    tp.add_argument("--state", default=None, help="state dir/file for state:modified/state:new")

    sub.add_parser("compile", help="dbt compile analog: render all models to target/compiled/")

    ls = sub.add_parser("list", help="enumerate project nodes (dbt ls analog)")
    ls.add_argument("--select", nargs="+", default=None)

    sv = sub.add_parser(
        "serve", help="SQL wire server (native MySQL protocol or JSON lines)"
    )
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=7817)
    sv.add_argument("--protocol", choices=["mysql", "json"], default="mysql")

    pp = sub.add_parser("profile", help="one-pass distributed column profile")
    pp.add_argument("model")

    ep = sub.add_parser("export", help="export a model to parquet/csv/json")
    ep.add_argument("model")
    ep.add_argument("--out", required=True)
    ep.add_argument("--format", choices=["parquet", "csv", "json", "orc"], default="parquet")
    ep.add_argument("--single-file", action="store_true")

    xp = sub.add_parser("explain", help="physical-plan audit for a model or SQL")
    xp.add_argument("model_or_sql")
    xp.add_argument("--full", action="store_true", help="print the formatted plan too")

    sub.add_parser("source-freshness", help="dbt source freshness analog")
    sub.add_parser("build", help="dbt build analog: run + data tests + unit tests")

    rop = sub.add_parser("run-operation", help="render/execute a project macro")
    rop.add_argument("macro")
    rop.add_argument("--args", default="{}", help="JSON object of macro kwargs")
    rop.add_argument("--execute", action="store_true", help="run the rendered SQL")

    lnp = sub.add_parser("lineage", help="column-level lineage via Catalyst pruning")
    lnp.add_argument("model")
    lnp.add_argument("--column", default=None, help="single output column (default: all)")

    gp = sub.add_parser(
        "generate", help="generate dbt artifacts: query/model from NL, staging, sources"
    )
    gsub = gp.add_subparsers(dest="action", required=True)
    gq = gsub.add_parser("query", help="NL -> SQL (optionally execute)")
    gq.add_argument("query")
    gq.add_argument("--execute", action="store_true")
    gm = gsub.add_parser("model", help="NL -> model SQL + schema.yml")
    gm.add_argument("query")
    gm.add_argument("--model-name", default=None)
    gm.add_argument("--output-path", default=None)
    gm.add_argument("--schema-yml", default=None)
    gm.add_argument("--dry-run", action="store_true")
    gm.add_argument("--overwrite", action="store_true")
    gs = gsub.add_parser("staging", help="staging model from a source table")
    gs.add_argument("source_name")
    gs.add_argument("table_name")
    gs.add_argument("--staging-path", default=None)
    gs.add_argument("--dry-run", action="store_true")
    gs.add_argument("--overwrite", action="store_true")
    gsrc = gsub.add_parser("sources", help="bootstrap sources.yml from the catalog")
    gsrc.add_argument("--source-name", default="main")
    gsrc.add_argument("--dry-run", action="store_true")

    wb = sub.add_parser("workbench", help="browser workbench (editor + preview + profile)")
    wb.add_argument("--host", default="127.0.0.1")
    wb.add_argument("--port", type=int, default=7818)

    np_ = sub.add_parser("nl", help="natural-language interface (query / generate)")
    nsub = np_.add_subparsers(dest="action", required=True)
    nq = nsub.add_parser("query", help="alias of `generate query`")
    nq.add_argument("query")
    nq.add_argument("--execute", action="store_true")
    ng = nsub.add_parser("generate", help="deprecated alias of `generate model`")
    ng.add_argument("query")
    ng.add_argument("--model-name", default=None)
    ng.add_argument("--output-path", default=None)
    ng.add_argument("--schema-yml", default=None)
    ng.add_argument("--dry-run", action="store_true")
    ng.add_argument("--overwrite", action="store_true")
    return p


def _slug_model_name(question: str, prefix: str = "nl") -> str:
    """Model name from an NL question (reference auto-generates when
    --model-name is absent, cli/main.py:846)."""
    import re as _re

    words = _re.findall(r"[a-z0-9]+", question.lower())[:6]
    return f"{prefix}_" + "_".join(words or ["model"])


def cmd_workbench(args) -> int:
    """Browser workbench (M35): zero-dependency http.server shell around
    SqlSession.workbench — editor, compile/lint/preview/profile panes,
    schema sidebar (the reference's Streamlit app without Streamlit)."""
    from dbt_osmosis_spark.workbench_http import serve_workbench

    spark, manifest = _build_context(args)
    srv = serve_workbench(spark, manifest, host=args.host, port=args.port)
    print(f"workbench at http://{srv.server_address[0]}:{srv.server_address[1]}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        srv.server_close()
    return 0


def cmd_generate(args) -> int:
    """`generate` group (SURVEY L3/L4/L5; reference cli/main.py:839-1451):
    query = NL→SQL (optionally execute), model = NL→model SQL + schema.yml,
    staging = source table → staging model + YAML, sources = bootstrap
    sources.yml from the live catalog. The NL translation runs on the
    configured backend (offline default: deterministic schema-grounded
    template, llm.py) — same CLI contract either way."""
    from dbt_osmosis_spark.llm import generate_staging_model, nl_to_sql
    from dbt_osmosis_spark.yaml_engine import YamlHandler

    if args.action == "query":
        if args.execute:
            from dbt_osmosis_spark.sql_ops import execute_sql_code

            spark, manifest = _build_context(args)
            sql = nl_to_sql(args.query, manifest)
            print(sql)
            _, df = execute_sql_code(spark, manifest, sql)
            df.show(PRINT_CAP, truncate=False)
        else:
            _, manifest = _build_context(args, need_spark=False)
            print(nl_to_sql(args.query, manifest))
        return 0

    if args.action == "model":
        _, manifest = _build_context(args, need_spark=False)
        name = args.model_name or _slug_model_name(args.query)
        sql = nl_to_sql(args.query, manifest)
        out_sql = _Path(
            args.output_path or _Path(args.project_dir) / "models" / f"{name}.sql"
        )
        out_yml = _Path(
            args.schema_yml or out_sql.with_name(f"{name}.yml")
        )
        doc = {
            "version": 2,
            "models": [{"name": name, "description": f"Generated from: {args.query}"}],
        }
        if args.dry_run:
            print(f"-- would write {out_sql}\n{sql}")
            print(f"# would write {out_yml}")
            return 0
        # guard BOTH targets: with a custom --schema-yml the .yml may not
        # exist while the model .sql does — never clobber it silently
        clobber = [p for p in (out_sql, out_yml) if p.exists()]
        if clobber and not args.overwrite:
            print(f"refusing to overwrite {', '.join(map(str, clobber))} (pass --overwrite)")
            return 1
        out_sql.parent.mkdir(parents=True, exist_ok=True)
        out_sql.write_text(sql + "\n")
        YamlHandler().write(out_yml, doc)
        print(f"wrote {out_sql}\nwrote {out_yml}")
        return 0

    if args.action == "staging":
        from dbt_osmosis_spark.compile import relation_name
        from dbt_osmosis_spark.introspect import get_columns

        spark, manifest = _build_context(args)
        source_key = f"{args.source_name}.{args.table_name}"
        cols = [c.name for c in get_columns(spark, relation_name(source_key))]
        spec = generate_staging_model(source_key, cols)
        sql = spec.to_sql(cols)
        name = f"stg_{args.table_name}"
        stg_dir = _Path(args.staging_path or _Path(args.project_dir) / "models" / "staging")
        out_sql = stg_dir / f"{name}.sql"
        out_yml = stg_dir / f"{name}.yml"
        doc = {
            "version": 2,
            "models": [
                {
                    "name": name,
                    "description": f"Staging model for {source_key}",
                    "columns": [
                        {"name": spec.renames.get(c, c)} for c in cols
                    ],
                }
            ],
        }
        if args.dry_run:
            print(f"-- would write {out_sql}\n{sql}\n# would write {out_yml}")
            return 0
        clobber = [p for p in (out_sql, out_yml) if p.exists()]
        if clobber and not args.overwrite:
            print(f"refusing to overwrite {', '.join(map(str, clobber))} (pass --overwrite)")
            return 1
        stg_dir.mkdir(parents=True, exist_ok=True)
        out_sql.write_text(sql + "\n")
        YamlHandler().write(out_yml, doc)
        print(f"wrote {out_sql}\nwrote {out_yml}")
        return 0

    # sources: register catalog tables no declared source covers (L5)
    from dbt_osmosis_spark.path_management import create_missing_source_yamls

    spark, manifest = _build_context(args)
    result = create_missing_source_yamls(
        spark,
        manifest,
        args.project_dir,
        source_name=args.source_name,
        dry_run=args.dry_run,
    )
    verb = "would create" if args.dry_run else "created"
    for t in result.created:
        print(f"{verb} source: {args.source_name}.{t}")
    if not result.created:
        print("all catalog tables already covered by declared sources")
    return 0


def cmd_nl(args) -> int:
    """`nl` group — kept as the reference keeps it (cli/main.py:1300,1451):
    `nl query` aliases `generate query`; `nl generate` is the deprecated
    alias of `generate model`."""
    if args.action == "generate":
        print(
            "warning: `nl generate` is deprecated; use `generate model` instead",
            file=sys.stderr,
        )
        args.action = "model"
    else:
        args.action = "query"
    return cmd_generate(args)


def cmd_retry(args) -> int:
    """dbt retry analog: read target/run_results.json, select the nodes
    that errored or were skipped, and re-run ONLY those (their successful
    ancestors register as existing relations — no rebuild)."""
    from dbt_osmosis_spark.artifacts import load_run_results

    rr_path = _Path(args.project_dir) / "target" / "run_results.json"
    if not rr_path.is_file():
        print(f"nothing to retry: {rr_path} not found (run `run` first)")
        return 1
    statuses = load_run_results(rr_path)
    failed = sorted(n for n, s in statuses.items() if s in ("error", "skipped"))
    manifest = _load_manifest(args)
    known = manifest.node_names()
    gone = [n for n in failed if n not in known]
    if gone:
        # a failed node deleted/renamed since the run: drop it rather than
        # crash Manifest.select on an unknown name
        print(f"ignoring {len(gone)} node(s) no longer in the project: {', '.join(gone)}")
        failed = [n for n in failed if n in known]
    if not failed:
        print("nothing to retry: previous run succeeded")
        return 0
    print(f"retrying {len(failed)} node(s): {', '.join(failed)}")
    args.select = failed
    args.exclude = None
    return cmd_run(args)


_DISPATCH = {
    "run": cmd_run,
    "retry": cmd_retry,
    "sql": cmd_sql,
    "yaml": cmd_yaml,
    "lint": cmd_lint,
    "validate": cmd_validate,
    "diff": cmd_diff,
    "catalog": cmd_catalog,
    "docs": cmd_docs,
    "compile": cmd_compile,
    "coverage": cmd_coverage,
    "test-suggest": cmd_test_suggest,
    "test": cmd_test,
    "profile": cmd_profile,
    "serve": cmd_serve,
    "list": cmd_list,
    "export": cmd_export,
    "explain": cmd_explain,
    "lineage": cmd_lineage,
    "source-freshness": cmd_source_freshness,
    "run-operation": cmd_run_operation,
    "build": cmd_build,
    "generate": cmd_generate,
    "nl": cmd_nl,
    "workbench": cmd_workbench,
}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    args.explicit_project_dir = args.project_dir is not None
    if args.project_dir is None:
        args.project_dir = "."
    return _DISPATCH[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
