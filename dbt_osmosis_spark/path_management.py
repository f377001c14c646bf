"""YAML path routing + missing-source bootstrap (SURVEY M20, M21).

The reference routes each node's docs to a YAML file via a user template
(`{model}/{parent}/{schema}/{node.*}` placeholders), selected per-node by the
most-specific FQN-prefix match among configured routes, with path-traversal
guards (reference: src/dbt_osmosis/core/path_management.py:56-260; vars
routing :56-121, target resolution :201-260).

`create_missing_source_yamls` scans the live catalog for tables that no
declared source covers and bootstraps sources.yml entries with introspected
columns (reference: src/dbt_osmosis/core/path_management.py:288-480) — in our
engine the catalog is `spark.catalog`, so the scan is one listTables sweep
plus per-table schema describes (no per-thread warehouse connections).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession


@dataclass
class PathTemplate:
    """One routing rule: FQN/path prefix → target template."""

    prefix: str  # "" = global fallback
    template: str  # e.g. "{parent}/_schemas/{model}.yml"


DEFAULT_TEMPLATE = "{parent}/{model}.yml"


def _node_vars(node: Any, node_path: str) -> dict[str, str]:
    p = Path(node_path)
    return {
        "model": p.stem,
        "node": p.stem,
        "parent": str(p.parent) if str(p.parent) != "." else "",
        "schema": getattr(node, "schema", None) or "main",
    }


def resolve_yaml_path(
    node: Any,
    project_dir: str | Path,
    routes: list[PathTemplate] | None = None,
) -> Path:
    """Pick the most-specific route whose prefix matches the node's project
    path, render its template, and guard against escaping the project dir."""
    project_dir = Path(project_dir).resolve()
    node_path = getattr(node, "path", f"{node.name}.sql")
    template = DEFAULT_TEMPLATE
    if routes:
        best = None
        for route in routes:
            if node_path.startswith(route.prefix) or node.name.startswith(route.prefix):
                if best is None or len(route.prefix) > len(best.prefix):
                    best = route
        if best is not None:
            template = best.template
    rendered = template.format(**_node_vars(node, node_path))
    target = (project_dir / rendered).resolve()
    if not str(target).startswith(str(project_dir)):
        raise ValueError(f"yaml path template escapes project dir: {rendered!r}")
    return target


@dataclass
class SourceBootstrapResult:
    created: list[str] = field(default_factory=list)  # table names added
    path: Path | None = None


def create_missing_source_yamls(
    spark: SparkSession,
    manifest: Any,
    project_dir: str | Path,
    source_name: str = "main",
    database: str | None = None,
    dry_run: bool = False,
) -> SourceBootstrapResult:
    """Register catalog tables that no declared source covers.

    One `listTables` sweep (the reference's `list_relations`), then a schema
    describe per new table; appends to <project_dir>/sources.yml and mirrors
    the entries into manifest.sources so a reload isn't required.
    ``dry_run`` reports the would-be-created tables without writing the
    file or mutating the manifest.
    """
    try:
        import yaml as _pyyaml
    except ImportError:  # pragma: no cover
        return SourceBootstrapResult()

    from dbt_osmosis_spark.project import SourceNode

    project_dir = Path(project_dir)
    known = {key.split(".", 1)[-1] for key in manifest.sources}
    known |= set(manifest.models) | set(manifest.seeds)

    result = SourceBootstrapResult()
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    new_tables = sorted(t.name for t in tables if t.name not in known)
    if not new_tables:
        return result

    entries = []
    for name in new_tables:
        schema = spark.table(name).schema
        entries.append(
            {
                "name": name,
                "columns": [
                    {"name": f.name, "data_type": f.dataType.simpleString()}
                    for f in schema.fields
                ],
            }
        )
        key = f"{source_name}.{name}"
        if not dry_run:
            manifest.sources[key] = SourceNode(
                name=key, path=name, format="table", schema=source_name
            )
        result.created.append(name)

    if dry_run:
        return result
    src_file = project_dir / "sources.yml"
    doc = _pyyaml.safe_load(src_file.read_text()) if src_file.exists() else None
    doc = doc or {"version": 2, "sources": []}
    block = next((s for s in doc["sources"] if s.get("name") == source_name), None)
    if block is None:
        block = {"name": source_name, "tables": []}
        doc["sources"].append(block)
    existing = {t.get("name") for t in block["tables"]}
    block["tables"].extend(e for e in entries if e["name"] not in existing)
    src_file.write_text(_pyyaml.safe_dump(doc, sort_keys=False))
    result.path = src_file
    return result
