"""Migration planning: schema diff → forward + rollback Spark SQL DDL
(SURVEY M28).

The reference plans per-dialect ALTER statements with breaking-change
gating and SQL/JSON/markdown export (reference:
src/dbt_osmosis/core/migration.py:235-600; the `spark` dialect is already
in its map at :360). Here Spark DDL is the only target:

  ALTER TABLE t ADD COLUMNS (c TYPE)
  ALTER TABLE t DROP COLUMN c
  ALTER TABLE t RENAME COLUMN a TO b
  ALTER TABLE t ALTER COLUMN c TYPE <t>   -- type widening (Spark 3.5+/v2)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from dbt_osmosis_spark.diff import ChangeSeverity, SchemaDiff


@dataclass
class MigrationPlan:
    model: str
    forward: list[str] = field(default_factory=list)
    rollback: list[str] = field(default_factory=list)
    blocked: list[str] = field(default_factory=list)  # breaking, not emitted

    def to_sql(self) -> str:
        return ";\n".join(self.forward) + (";" if self.forward else "")

    def to_json(self) -> str:
        return json.dumps(
            {
                "model": self.model,
                "forward": self.forward,
                "rollback": self.rollback,
                "blocked": self.blocked,
            },
            indent=2,
        )

    def to_markdown(self) -> str:
        lines = [f"## Migration: {self.model}", "", "### Forward"]
        lines += [f"- `{s}`" for s in self.forward] or ["- (none)"]
        lines += ["", "### Rollback"]
        lines += [f"- `{s}`" for s in self.rollback] or ["- (none)"]
        if self.blocked:
            lines += ["", "### Blocked (breaking — needs allow_breaking)"]
            lines += [f"- {s}" for s in self.blocked]
        return "\n".join(lines)


def plan_migration(
    diff: SchemaDiff, table: str | None = None, allow_breaking: bool = False
) -> MigrationPlan:
    """(reference per-change planners: migration.py:425-578)"""
    table = table or diff.model
    plan = MigrationPlan(model=diff.model)
    for ch in diff.changes:
        breaking = ch.severity == ChangeSeverity.BREAKING
        if ch.kind == "added":
            plan.forward.append(f"ALTER TABLE {table} ADD COLUMNS ({ch.column} {ch.new})")
            plan.rollback.append(f"ALTER TABLE {table} DROP COLUMN {ch.column}")
        elif ch.kind == "removed":
            stmt = f"ALTER TABLE {table} DROP COLUMN {ch.column}"
            if breaking and not allow_breaking:
                plan.blocked.append(stmt)
            else:
                plan.forward.append(stmt)
                plan.rollback.append(
                    f"ALTER TABLE {table} ADD COLUMNS ({ch.column} {ch.old or 'string'})"
                )
        elif ch.kind == "renamed":
            plan.forward.append(f"ALTER TABLE {table} RENAME COLUMN {ch.old} TO {ch.new}")
            plan.rollback.append(f"ALTER TABLE {table} RENAME COLUMN {ch.new} TO {ch.old}")
        elif ch.kind == "type_changed":
            stmt = f"ALTER TABLE {table} ALTER COLUMN {ch.column} TYPE {ch.new}"
            if breaking and not allow_breaking:
                plan.blocked.append(stmt)
            else:
                plan.forward.append(stmt)
                plan.rollback.append(
                    f"ALTER TABLE {table} ALTER COLUMN {ch.column} TYPE {ch.old}"
                )
    return plan
