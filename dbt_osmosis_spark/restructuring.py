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


def _has_section_content(value) -> bool:
    """Whether a YAML section still carries content worth preserving
    (reference: restructuring.py:294-304)."""
    if value is None:
        return False
    if isinstance(value, (str, bytes)):
        return bool(value)
    try:
        return len(value) > 0
    except TypeError:
        return True


def _file_is_drained(doc: dict) -> bool:
    """A superseded file may be deleted only when NOTHING remains — not just
    models: sources, seeds, exposures and any unknown user-authored
    top-level section all block deletion (reference:
    restructuring.py:306-318 _has_remaining_superseded_content)."""
    return not any(
        _has_section_content(v) for k, v in doc.items() if k != "version"
    )


def apply_restructure_plan(
    plan: RestructureDeltaPlan,
    yaml: YamlHandler | None = None,
    dry_run: bool = False,
) -> list[Path]:
    """Execute the plan: merge entries into targets (atomic writes via the
    YAML engine), drain superseded files, delete files emptied of ALL
    content (user-authored sections like exposures keep a file alive), and
    prune directories the deletions emptied. ``dry_run`` computes the
    target list without touching disk. Returns the written target paths."""
    yaml = yaml or YamlHandler()
    written: list[Path] = []
    for op in plan.operations:
        target_doc = yaml.read(op.target) if op.target.exists() else {}
        target_doc.setdefault("version", 2)
        for model in op.models:
            entry = ensure_model_entry(target_doc, model)
            for src in op.superseded:
                if not src.exists() or src.resolve() == op.target.resolve():
                    continue  # same-path supersede is a no-op
                src_doc = yaml.read(src)
                moved = model_entry(src_doc, model)
                if moved:
                    entry.update({k: v for k, v in moved.items() if k != "name"})
                    src_doc["models"] = [
                        m for m in src_doc.get("models", []) if m.get("name") != model
                    ]
                    if not dry_run:
                        yaml.write(src, src_doc)
        written.append(op.target)
        if dry_run:
            continue
        op.target.parent.mkdir(parents=True, exist_ok=True)
        yaml.write(op.target, target_doc)
        for src in op.superseded:
            if not src.exists() or src.resolve() == op.target.resolve():
                continue
            leftover = yaml.read(src)
            if _file_is_drained(leftover):
                src.unlink()
                parent = src.parent
                if parent.exists() and not any(parent.iterdir()):
                    parent.rmdir()
    return written
