"""YAML schema-document validators (SURVEY M37).

Structural validation of schema YAML docs before write/commit, at the
reference's behavior depth (reference:
src/dbt_osmosis/core/schema/validation.py:226-996):

- model/source entry shape, duplicate model/column detection
- test configs: known-test warning, one-key map shape, dbt's nested
  `arguments:` form, relationships to/field, accepted_values values
  list/emptiness, unique_combination_of_columns arity
- versioned models: v presence/type, duplicate versions (1 vs "1" match),
  latest_version type + membership, per-version columns/tests, and the
  include/exclude column selector rules (include must be 'all'/'*' or a
  string list; exclude only with include-all; at most one selector)

Pure driver-side checks; fail-closed on duplicates like the reference's
sync guards (src/dbt_osmosis/core/sync_operations.py:535-604).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

VALID_TESTS = {
    "unique",
    "not_null",
    "unique_combination_of_columns",
    "relationships",
    "accepted_values",
}

_INCLUDE_ALL = ("all", "*")


@dataclass
class Violation:
    path: str  # doc location, e.g. "models[0].columns[2]"
    code: str
    message: str
    severity: str = "error"  # error | warning


def _is_string_list(v: Any) -> bool:
    return isinstance(v, list) and all(isinstance(x, str) for x in v)


def _version_key(v: Any) -> str:
    """Canonical version identity: 1, 1.0 and "1" identify the same
    version (reference: _version_values_match)."""
    try:
        f = float(v)
        return str(int(f)) if f == int(f) else str(f)
    except (TypeError, ValueError):
        return str(v)


def _test_args(cfg: Any, loc: str, out: list[Violation]) -> dict | None:
    """Resolve a test's argument dict, supporting both the legacy flat form
    and dbt's nested `arguments:` shape."""
    if not isinstance(cfg, dict):
        out.append(
            Violation(loc, "test-config-not-map", "test configuration must be a mapping")
        )
        return None
    args = cfg.get("arguments")
    if args is None:
        return cfg
    if not isinstance(args, dict):
        out.append(
            Violation(loc, "test-arguments-not-map", "test 'arguments' must be a mapping")
        )
        return None
    return args


def _check_tests(tests: Any, where: str, out: list[Violation]) -> None:
    if tests is None:
        return
    if not isinstance(tests, list):
        out.append(Violation(where, "tests-not-list", "tests/data_tests must be a list"))
        return
    for i, t in enumerate(tests):
        loc = f"{where}[{i}]"
        if isinstance(t, str):
            if t not in VALID_TESTS:
                out.append(
                    Violation(loc, "unknown-test", f"unknown test '{t}'", "warning")
                )
            continue
        if not isinstance(t, dict) or len(t) != 1:
            out.append(
                Violation(loc, "bad-test-entry", "test entry must be a name or one-key map")
            )
            continue
        name, cfg = next(iter(t.items()))
        cfg = cfg if cfg is not None else {}
        if name == "accepted_values":
            args = _test_args(cfg, loc, out)
            if args is None:
                continue
            if "values" not in args:
                out.append(
                    Violation(
                        loc, "accepted-values-args", "accepted_values requires a 'values' list"
                    )
                )
            elif not isinstance(args["values"], list):
                out.append(
                    Violation(loc, "accepted-values-type", "'values' must be a list")
                )
            elif len(args["values"]) == 0:
                out.append(
                    Violation(loc, "accepted-values-empty", "'values' list is empty", "warning")
                )
        elif name == "relationships":
            args = _test_args(cfg, loc, out)
            if args is None:
                continue
            for req in ("to", "field"):
                if not args.get(req):
                    out.append(
                        Violation(
                            loc,
                            "relationships-args",
                            f"relationships requires '{req}'",
                        )
                    )
        elif name == "unique_combination_of_columns":
            args = _test_args(cfg, loc, out)
            if args is None:
                continue
            cols = args.get("combination_of_columns")
            if cols is None:
                out.append(
                    Violation(
                        loc,
                        "unique-combination-args",
                        "unique_combination_of_columns requires 'combination_of_columns'",
                    )
                )
            elif not isinstance(cols, list):
                out.append(
                    Violation(
                        loc, "unique-combination-type", "'combination_of_columns' must be a list"
                    )
                )
            elif len(cols) < 2:
                out.append(
                    Violation(
                        loc,
                        "unique-combination-few",
                        "'combination_of_columns' should have at least 2 columns",
                        "warning",
                    )
                )


def _check_version_selector(col: dict, loc: str, out: list[Violation]) -> None:
    """dbt version column include/exclude selector rules."""
    if "include" not in col:
        out.append(
            Violation(loc, "version-selector-include", "column selector must define 'include'")
        )
        return
    inc = col["include"]
    include_all = isinstance(inc, str) and inc in _INCLUDE_ALL
    if not include_all and not _is_string_list(inc):
        out.append(
            Violation(
                loc,
                "version-selector-include",
                "'include' must be 'all', '*', or a list of strings",
            )
        )
    if "exclude" not in col:
        return
    exc = col["exclude"]
    if not _is_string_list(exc):
        out.append(
            Violation(
                loc, "version-selector-exclude", "'exclude' must be a list of strings"
            )
        )
        return
    if exc and not include_all:
        out.append(
            Violation(
                loc,
                "include-exclude-conflict",
                "'exclude' is only allowed when include is 'all' or '*'",
            )
        )


def _check_columns(
    columns: Any, where: str, out: list[Violation], version_owner: bool = False
) -> None:
    if columns is None:
        return
    if not isinstance(columns, list):
        out.append(Violation(where, "columns-not-list", "columns must be a list"))
        return
    seen: set[str] = set()
    selector_seen = False
    for i, col in enumerate(columns):
        loc = f"{where}[{i}]"
        if not isinstance(col, dict):
            out.append(Violation(loc, "column-missing-name", "column entry requires a name"))
            continue
        if version_owner and not col.get("name") and ("include" in col or "exclude" in col):
            if selector_seen:
                out.append(
                    Violation(
                        loc,
                        "version-selector-multiple",
                        "at most one include/exclude column selector per version",
                    )
                )
            selector_seen = True
            _check_version_selector(col, loc, out)
            continue
        if not col.get("name"):
            out.append(Violation(loc, "column-missing-name", "column entry requires a name"))
            continue
        if col["name"] in seen:
            out.append(Violation(loc, "duplicate-column", f"duplicate column '{col['name']}'"))
        seen.add(col["name"])
        for key in ("tests", "data_tests"):
            _check_tests(col.get(key), f"{loc}.{key}", out)


def _check_versions(m: dict, loc: str, out: list[Violation]) -> None:
    versions = m.get("versions")
    latest = m.get("latest_version")
    if versions is None:
        if latest is not None:
            out.append(
                Violation(
                    loc,
                    "latest-version-invalid",
                    f"latest_version '{latest}' requires declared versions",
                )
            )
        return
    if not isinstance(versions, list):
        out.append(Violation(f"{loc}.versions", "versions-not-list", "versions must be a list"))
        return
    seen: dict[str, int] = {}
    for j, v in enumerate(versions):
        vloc = f"{loc}.versions[{j}]"
        if not isinstance(v, dict):
            out.append(Violation(vloc, "version-entry-not-map", "version entry must be a mapping"))
            continue
        vv = v.get("v")
        if vv is None:
            out.append(Violation(vloc, "version-missing-v", "version entry requires 'v'"))
        elif isinstance(vv, bool) or not isinstance(vv, (int, float, str)):
            out.append(
                Violation(
                    vloc, "version-v-type", "'v' must be an int, float, or string"
                )
            )
        else:
            key = _version_key(vv)
            if key in seen:
                out.append(
                    Violation(
                        vloc,
                        "duplicate-version",
                        f"duplicate version '{vv}' (also at versions[{seen[key]}])",
                    )
                )
            else:
                seen[key] = j
        for tkey in ("tests", "data_tests"):
            _check_tests(v.get(tkey), f"{vloc}.{tkey}", out)
        _check_columns(v.get("columns"), f"{vloc}.columns", out, version_owner=True)
    if latest is None:
        return
    if isinstance(latest, bool) or not isinstance(latest, (int, float, str)):
        out.append(
            Violation(
                loc, "latest-version-invalid", "latest_version must be an int, float, or string"
            )
        )
        return
    if _version_key(latest) not in seen:
        out.append(
            Violation(
                loc,
                "latest-version-invalid",
                f"latest_version '{latest}' must be one of the declared versions",
            )
        )


def validate_schema_doc(doc: dict) -> list[Violation]:
    """All structural violations in one pass; empty list = valid."""
    out: list[Violation] = []
    if not isinstance(doc, dict):
        return [Violation("$", "doc-not-map", "schema document must be a mapping")]
    models = doc.get("models")
    if models is not None and not isinstance(models, list):
        out.append(Violation("models", "models-not-list", "models must be a list"))
        models = None
    seen_models: set[str] = set()
    for i, m in enumerate(models or []):
        loc = f"models[{i}]"
        if not isinstance(m, dict) or not m.get("name"):
            out.append(Violation(loc, "model-missing-name", "model entry requires a name"))
            continue
        key = (m["name"], str(m.get("version", "")))
        if key in seen_models:
            out.append(
                Violation(loc, "duplicate-model", f"duplicate model entry '{m['name']}'")
            )
        seen_models.add(key)
        _check_columns(m.get("columns"), f"{loc}.columns", out)
        for tkey in ("tests", "data_tests"):
            _check_tests(m.get(tkey), f"{loc}.{tkey}", out)
        _check_versions(m, loc, out)
    for i, s in enumerate(doc.get("sources") or []):
        loc = f"sources[{i}]"
        if not isinstance(s, dict) or not s.get("name"):
            out.append(Violation(loc, "source-missing-name", "source entry requires a name"))
            continue
        tables = s.get("tables")
        if tables is not None and not isinstance(tables, list):
            out.append(Violation(f"{loc}.tables", "tables-not-list", "tables must be a list"))
            continue
        for j, t in enumerate(tables or []):
            tloc = f"{loc}.tables[{j}]"
            if not isinstance(t, dict) or not t.get("name"):
                out.append(Violation(tloc, "table-missing-name", "source table requires a name"))
                continue
            _check_columns(t.get("columns"), f"{tloc}.columns", out)
            for tkey in ("tests", "data_tests"):
                _check_tests(t.get(tkey), f"{tloc}.{tkey}", out)
    return out


def validate_project_schemas(project_dir: str) -> dict[str, list[Violation]]:
    """Validate every property YAML under the project's model/seed/snapshot
    paths (the files the project OWNS — vendored dbt_packages/, target/,
    and anything outside the resource paths are not this project's to
    fail); returns {relative_path: violations} for files with findings."""
    from pathlib import Path

    try:
        import yaml as _pyyaml
    except ImportError:  # pragma: no cover
        return {}

    root = Path(project_dir)
    proj_file = next(
        (p for p in (root / "dbt_project.yml", root / "project.yml") if p.exists()), None
    )
    resource_dirs = ["models", "seeds", "snapshots"]
    if proj_file is not None:
        try:
            cfg = _pyyaml.safe_load(proj_file.read_text()) or {}
            resource_dirs = []
            for key, default in (
                ("model-paths", "models"),
                ("seed-paths", "seeds"),
                ("snapshot-paths", "snapshots"),
            ):
                v = cfg.get(key) or cfg.get(key.replace("-", "_")) or [default]
                resource_dirs.extend([v] if isinstance(v, str) else list(v))
        except Exception:
            pass

    files: list[Path] = []
    for d in resource_dirs:
        p = root / d
        if p.is_dir():
            files.extend(sorted(p.rglob("*.yml")) + sorted(p.rglob("*.yaml")))
    out: dict[str, list[Violation]] = {}
    for f in files:
        if f.name in ("project.yml", "dbt_project.yml", "profiles.yml", "dbt-osmosis.yml"):
            continue
        if f.name == "sources.yml" and f.parent == root:
            # the native-layout root sources.yml is a source REGISTRY, not a
            # property file; a models/sources.yml in dbt layout is a normal
            # property file and must be validated like any other
            continue
        try:
            doc = _pyyaml.safe_load(f.read_text())
        except Exception as exc:
            out[str(f.relative_to(root))] = [
                Violation("$", "yaml-parse-error", str(exc))
            ]
            continue
        if not isinstance(doc, dict) or not (
            doc.get("models") or doc.get("sources") or doc.get("seeds")
        ):
            continue  # not a schema property file
        violations = validate_schema_doc(doc)
        if violations:
            out[str(f.relative_to(root))] = violations
    return out
