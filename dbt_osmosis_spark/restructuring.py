"""Doc-file restructure planner/applier (SURVEY M22).

The reference computes current-vs-target YAML locations for every node, folds
them into per-target-file operations (create minimal file / migrate existing
entries and supersede the old file), dedupes by target, applies them, and
deletes files left empty (reference: src/dbt_osmosis/core/restructuring.py:
103-238 plan, :351-479 apply). Filesystem-plane logic — driver-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from dbt_osmosis_spark.path_management import PathTemplate, resolve_yaml_path
from dbt_osmosis_spark.yaml_engine import YamlHandler, ensure_model_entry, model_entry


@dataclass
class RestructureOperation:
    """Move/merge the given models' doc entries into `target`."""

    target: Path
    models: list[str] = field(default_factory=list)
    superseded: list[Path] = field(default_factory=list)  # files to drain

    def describe(self) -> str:
        src = ", ".join(p.name for p in self.superseded) or "(new)"
        return f"{src} -> {self.target.name}: {', '.join(self.models)}"


@dataclass
class RestructureDeltaPlan:
    operations: list[RestructureOperation] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return not self.operations


def draft_restructure_plan(
    manifest,
    project_dir: str | Path,
    routes: list[PathTemplate] | None = None,
    current_paths: dict[str, Path] | None = None,
) -> RestructureDeltaPlan:
    """current-vs-target location per model → per-target ops, deduped.

    ``current_paths`` maps model → the YAML file its docs live in today
    (defaults to the sidecar `<model>.yml` convention used by transforms).
    """
    project_dir = Path(project_dir)
    plan = RestructureDeltaPlan()
    by_target: dict[Path, RestructureOperation] = {}
    for name, node in sorted(manifest.models.items()):
        current = (
            current_paths.get(name)
            if current_paths
            else project_dir / Path(node.path).with_suffix(".yml")
        )
        target = resolve_yaml_path(node, project_dir, routes)
        if current is not None and current.resolve() == target:
            continue
        op = by_target.setdefault(target, RestructureOperation(target=target))
        op.models.append(name)
        if current is not None and current.exists() and current not in op.superseded:
            op.superseded.append(current)
    plan.operations = [by_target[k] for k in sorted(by_target)]
    return plan


def apply_restructure_plan(
    plan: RestructureDeltaPlan,
    yaml: YamlHandler | None = None,
) -> list[Path]:
    """Execute the plan: merge entries into targets (atomic writes via the
    YAML engine), drain superseded files, delete files emptied of models.
    Returns the written target paths."""
    yaml = yaml or YamlHandler()
    written: list[Path] = []
    for op in plan.operations:
        target_doc = yaml.read(op.target) if op.target.exists() else {}
        for model in op.models:
            entry = ensure_model_entry(target_doc, model)
            for src in op.superseded:
                if not src.exists():
                    continue
                src_doc = yaml.read(src)
                moved = model_entry(src_doc, model)
                if moved:
                    entry.update({k: v for k, v in moved.items() if k != "name"})
                    src_doc["models"] = [
                        m for m in src_doc.get("models", []) if m.get("name") != model
                    ]
                    yaml.write(src, src_doc)
        op.target.parent.mkdir(parents=True, exist_ok=True)
        yaml.write(op.target, target_doc)
        written.append(op.target)
        for src in op.superseded:
            if src.exists():
                leftover = yaml.read(src)
                if not leftover.get("models") and not leftover.get("sources"):
                    src.unlink()
    return written
