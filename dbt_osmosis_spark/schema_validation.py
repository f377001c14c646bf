"""YAML schema-document validators (SURVEY M37).

Structural validation of schema YAML docs before write/commit: model/source
entry shape, duplicate detection, test-config argument checks
(accepted_values needs a values list; relationships needs to+field), version
include/exclude rules (reference:
src/dbt_osmosis/core/schema/validation.py:226-996). Pure driver-side checks;
fail-closed on duplicates like the reference's sync guards
(src/dbt_osmosis/core/sync_operations.py:535-604).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any


@dataclass
class Violation:
    path: str  # doc location, e.g. "models[0].columns[2]"
    code: str
    message: str


def _check_tests(tests: Any, where: str, out: list[Violation]) -> None:
    if tests is None:
        return
    if not isinstance(tests, list):
        out.append(Violation(where, "tests-not-list", "tests/data_tests must be a list"))
        return
    for i, t in enumerate(tests):
        loc = f"{where}[{i}]"
        if isinstance(t, str):
            continue
        if not isinstance(t, dict) or len(t) != 1:
            out.append(Violation(loc, "bad-test-entry", "test entry must be a name or one-key map"))
            continue
        name, cfg = next(iter(t.items()))
        cfg = cfg or {}
        if name == "accepted_values" and not isinstance(cfg.get("values"), list):
            out.append(Violation(loc, "accepted-values-args", "accepted_values requires a 'values' list"))
        if name == "relationships" and not (cfg.get("to") and cfg.get("field")):
            out.append(Violation(loc, "relationships-args", "relationships requires 'to' and 'field'"))


def _check_columns(columns: Any, where: str, out: list[Violation]) -> None:
    if columns is None:
        return
    if not isinstance(columns, list):
        out.append(Violation(where, "columns-not-list", "columns must be a list"))
        return
    seen: set[str] = set()
    for i, col in enumerate(columns):
        loc = f"{where}[{i}]"
        if not isinstance(col, dict) or not col.get("name"):
            out.append(Violation(loc, "column-missing-name", "column entry requires a name"))
            continue
        if col["name"] in seen:
            out.append(Violation(loc, "duplicate-column", f"duplicate column '{col['name']}'"))
        seen.add(col["name"])
        for key in ("tests", "data_tests"):
            _check_tests(col.get(key), f"{loc}.{key}", out)


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
        versions = m.get("versions")
        if versions is not None:
            if not isinstance(versions, list):
                out.append(Violation(f"{loc}.versions", "versions-not-list", "versions must be a list"))
            else:
                for j, v in enumerate(versions):
                    if not isinstance(v, dict) or "v" not in v:
                        out.append(
                            Violation(f"{loc}.versions[{j}]", "version-missing-v", "version entry requires 'v'")
                        )
                    else:
                        cols = v.get("columns")
                        for k, c in enumerate(cols or []):
                            if isinstance(c, dict) and "include" in c and "exclude" in c:
                                out.append(
                                    Violation(
                                        f"{loc}.versions[{j}].columns[{k}]",
                                        "include-exclude-conflict",
                                        "version columns cannot set both include and exclude",
                                    )
                                )
    for i, s in enumerate(doc.get("sources") or []):
        loc = f"sources[{i}]"
        if not isinstance(s, dict) or not s.get("name"):
            out.append(Violation(loc, "source-missing-name", "source entry requires a name"))
            continue
        for j, t in enumerate(s.get("tables") or []):
            tloc = f"{loc}.tables[{j}]"
            if not isinstance(t, dict) or not t.get("name"):
                out.append(Violation(tloc, "table-missing-name", "source table requires a name"))
                continue
            _check_columns(t.get("columns"), f"{tloc}.columns", out)
    return out
