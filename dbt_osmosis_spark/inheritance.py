"""Column knowledge inheritance (SURVEY M5-M8).

Ports the reference's documentation "knowledge graph": walk a node's
ancestors generation by generation (BFS, cycle-guarded, depth-capped —
reference: src/dbt_osmosis/core/inheritance.py:290-339), collect per-column
metadata farthest-first so closer generations override
(reference: inheritance.py:824-956), match columns across renames via
case/prefix variants provided by pluggy hooks
(reference: src/dbt_osmosis/core/plugins.py:31-62).

Merge rules preserved from the reference (inheritance.py:600-654):
- description: closest non-empty generation wins;
- tags: union, preserving first-seen order;
- meta: dict-merge, farthest first (closer keys override), `osmosis_*`
  bookkeeping keys excluded.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import pluggy

from dbt_osmosis_spark.project import Manifest

MAX_DEPTH = 100  # reference: inheritance.py:296

hookspec = pluggy.HookspecMarker("dbt_osmosis_spark")
hookimpl = pluggy.HookimplMarker("dbt_osmosis_spark")


class ColumnVariantSpec:
    @hookspec
    def get_candidates(self, name: str) -> list[str]:  # type: ignore[empty-body]
        """Alternative source-column names that may document `name`."""


class DefaultVariants:
    @hookimpl
    def get_candidates(self, name: str) -> list[str]:
        # case variants (reference: plugins.py:31-47)
        out = [name.lower(), name.upper()]
        # snake -> camel/Pascal
        parts = name.lower().split("_")
        if len(parts) > 1:
            camel = parts[0] + "".join(p.title() for p in parts[1:])
            out += [camel, camel[:1].upper() + camel[1:]]
        # common prefix strips (reference prefix-strip plugin)
        for prefix in ("stg_", "src_", "raw_"):
            if name.startswith(prefix):
                out.append(name[len(prefix):])
        return out


def plugin_manager() -> pluggy.PluginManager:
    pm = pluggy.PluginManager("dbt_osmosis_spark")
    pm.add_hookspecs(ColumnVariantSpec)
    pm.register(DefaultVariants())
    return pm


@dataclass
class ColumnKnowledge:
    description: str = ""
    tags: list[str] = field(default_factory=list)
    meta: dict = field(default_factory=dict)
    progenitor: str | None = None

    def empty(self) -> bool:
        return not (self.description or self.tags or self.meta)


def ancestor_generations(
    manifest: Manifest, node_name: str, max_depth: int = MAX_DEPTH
) -> list[list[str]]:
    """Generations of model ancestors, closest first; cycle-guarded BFS,
    deterministic (sorted) within a generation (reference:
    inheritance.py:290-339)."""
    seen = {node_name}
    out: list[list[str]] = []
    frontier = deque([node_name])
    for _ in range(max_depth):
        next_gen: set[str] = set()
        while frontier:
            cur = frontier.popleft()
            node = manifest.models.get(cur)
            if node is None:
                continue
            for dep in node.depends_on:
                if dep not in seen:
                    next_gen.add(dep)
                    seen.add(dep)
        if not next_gen:
            break
        gen = sorted(next_gen)
        out.append(gen)
        frontier.extend(gen)
    return out


def build_knowledge_graph(
    manifest: Manifest,
    node_name: str,
    columns_of: dict[str, dict[str, dict]],
    pm: pluggy.PluginManager | None = None,
) -> dict[str, ColumnKnowledge]:
    """Fold ancestor column docs into per-column knowledge for `node_name`.

    ``columns_of``: node -> {column_name -> {description, tags, meta}} (from
    YAML docs / introspection). Walk farthest generation first so closer
    generations override (reference: inheritance.py:824-956).
    """
    pm = pm or plugin_manager()
    gens = ancestor_generations(manifest, node_name)
    target_cols = columns_of.get(node_name, {})
    graph: dict[str, ColumnKnowledge] = {c: ColumnKnowledge() for c in target_cols}
    # every ancestor that could have documented each column — the candidate
    # set a user-pinned progenitor override must come from
    alternatives: dict[str, list[str]] = {c: [] for c in target_cols}

    def _variant_hit(col: str, anc_cols: dict) -> str | None:
        variants = [col]
        for res in pm.hook.get_candidates(name=col):
            variants.extend(res)
        return next((v for v in variants if v in anc_cols), None)

    for gen in reversed(gens):  # farthest -> closest
        for ancestor in gen:
            anc_cols = columns_of.get(ancestor, {})
            if not anc_cols:
                continue
            for col, know in graph.items():
                hit = _variant_hit(col, anc_cols)
                if hit is None:
                    continue
                meta_src = anc_cols[hit]
                desc = (meta_src.get("description") or "").strip()
                if desc:
                    know.description = desc
                    know.progenitor = ancestor
                    if ancestor not in alternatives[col]:
                        alternatives[col].append(ancestor)
                for tag in meta_src.get("tags") or []:
                    if tag not in know.tags:
                        know.tags.append(tag)
                for k, v in (meta_src.get("meta") or {}).items():
                    if not str(k).startswith("osmosis_"):
                        know.meta[k] = v

    # progenitor override pass (reference: inheritance.py:747-806; M8): the
    # user pins a specific inheritance source via column-level
    # `column_default_progenitor` (column meta) or model-level
    # `default_progenitor` (node meta). Honored only when it names a real
    # documented ancestor and differs from the auto-selected progenitor.
    target_node = manifest.models.get(node_name)
    for col, know in graph.items():
        override = (target_cols.get(col, {}).get("meta") or {}).get(
            "column_default_progenitor"
        )
        if not override and target_node is not None:
            override = (getattr(target_node, "meta", None) or {}).get("default_progenitor")
        if (
            not override
            or override == know.progenitor
            or override not in alternatives[col]
        ):
            continue
        anc_cols = columns_of.get(override, {})
        hit = _variant_hit(col, anc_cols)
        if hit is None:
            continue
        meta_src = anc_cols[hit]
        desc = (meta_src.get("description") or "").strip()
        if desc:
            know.description = desc
            know.progenitor = override
    return graph
