"""Project model: manifest, nodes, filters, topological ordering.

Re-expresses the reference's manifest handling (reference:
src/dbt_osmosis/core/config.py:437-453 — dict nodes + sources with
depends_on edge lists) as plain dataclasses, and ports its DAG algorithms:

- Kahn topological sort with cycle detection
  (reference: src/dbt_osmosis/core/node_filters.py:61-110)
- candidate filtering by resource type / fqn / path
  (reference: src/dbt_osmosis/core/node_filters.py:113-150)

The graph is metadata (thousands of nodes, not billions of rows) so this is
driver-side Python by design — the *data* each model touches is what runs
distributed on Spark.

A project directory looks like:

    my_project/
      project.yml          # name, vars, model configs
      seeds/*.csv          # S1 seed tables
      models/**/*.sql      # Jinja-SQL models ({{ ref() }}, {{ source() }})
      sources.yml          # external tables (name -> path/format)
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator

try:
    import yaml as _pyyaml  # type: ignore
except ImportError:  # pragma: no cover
    _pyyaml = None


@dataclass
class SourceNode:
    """An external table: name → storage path + format. ``path=None`` marks
    a declared-only (warehouse-native) source: visible to lineage/yaml/docs
    but with nothing for Spark to read — registration skips it and the
    runner raises a named diagnostic if an executed model reads it."""

    name: str
    path: str | None
    format: str = "parquet"
    schema: str | None = None
    description: str = ""
    # dbt source-freshness contract: the event-time column and the
    # warn_after/error_after thresholds ({count, period}) from sources.yml
    loaded_at_field: str | None = None
    freshness: dict = field(default_factory=dict)


@dataclass
class SeedNode:
    """A CSV seed (reference: dbt seed; SURVEY S1)."""

    name: str
    path: str
    description: str = ""
    # dbt seed config `column_types`: per-column type overrides applied on
    # top of CSV inference (project.yml `seeds:` section)
    column_types: dict = field(default_factory=dict)


@dataclass
class ModelNode:
    """A Jinja-SQL model. ``depends_on`` is filled at parse time by scanning
    {{ ref(...) }} / {{ source(...) }} calls (static extraction — same job
    dbt's parser does before full Jinja rendering)."""

    name: str
    raw_sql: str
    path: str
    materialized: str = "view"  # view | table | ephemeral
    language: str = "sql"  # sql | python (dbt python models)
    depends_on: list[str] = field(default_factory=list)
    description: str = ""
    config: dict = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)
    # from schema YAML next to the model (dbt properties file): declared
    # columns [{name, data_type, constraints, ...}] and whether the model's
    # contract is enforced at build time (runner → contracts.enforce_contract)
    columns: list[dict] = field(default_factory=list)
    contract: bool = False
    # dbt model governance (v1.5+): group membership and access level.
    # access='private' models may only be ref()'d from their own group.
    group: str | None = None
    access: str = "protected"  # private | protected | public
    # dbt node `meta:` from the property file (settings tier 2) and the
    # config values exactly as written before any rendering (dbt 1.10's
    # unrendered_config — settings tier 5; lets dbt-osmosis read a config
    # value even when rendering rewrote or dropped it)
    meta: dict = field(default_factory=dict)
    unrendered_config: dict = field(default_factory=dict)


_REF_RE = re.compile(
    r"{{-?\s*ref\(\s*['\"]([^'\"]+)['\"]\s*(?:,\s*(?:v|version)\s*=\s*(\d+)\s*)?\)\s*-?}}"
)
_SOURCE_RE = re.compile(r"{{-?\s*source\(\s*['\"]([^'\"]+)['\"]\s*,\s*['\"]([^'\"]+)['\"]\s*\)\s*-?}}")
_CONFIG_RE = re.compile(r"{{\s*config\(")
# dbt snapshot blocks: {% snapshot name %} select ... {% endsnapshot %}
_SNAPSHOT_RE = re.compile(r"{%-?\s*snapshot\s+(\w+)\s*-?%}(.*?){%-?\s*endsnapshot\s*-?%}", re.S)


def _ref_deps(raw: str) -> list[str]:
    """Static ref() dependency names; a versioned ref('m', v=2) depends on
    the m_v2 node (dbt's versioned-ref contract)."""
    return [f"{name}_v{v}" if v else name for name, v in _REF_RE.findall(raw)]
# python models (dbt `def model(dbt, session)`): static extraction mirrors
# dbt's AST scan of dbt.ref/dbt.source/dbt.config calls before execution
_PY_REF_RE = re.compile(r"dbt\.ref\(\s*['\"]([^'\"]+)['\"]\s*\)")
_PY_SOURCE_RE = re.compile(r"dbt\.source\(\s*['\"]([^'\"]+)['\"]\s*,\s*['\"]([^'\"]+)['\"]\s*\)")
_PY_CONFIG_RE = re.compile(r"dbt\.config\(")


@dataclass
class Manifest:
    """All nodes of a project keyed by name; edges in depends_on."""

    models: dict[str, ModelNode] = field(default_factory=dict)
    sources: dict[str, SourceNode] = field(default_factory=dict)
    seeds: dict[str, SeedNode] = field(default_factory=dict)
    vars: dict = field(default_factory=dict)
    project_name: str = "project"
    # concatenated {% macro %} definitions from macros/*.sql, prepended to
    # every model at compile time (dbt macro semantics)
    macro_source: str = ""
    # project-level hooks from project.yml (dbt on-run-start / on-run-end)
    on_run_start: list[str] = field(default_factory=list)
    on_run_end: list[str] = field(default_factory=list)
    # dbt exposures: declared downstream consumers (dashboards, ML jobs)
    # {name: {"type":..., "owner":..., "depends_on": [model names]}}
    exposures: dict = field(default_factory=dict)
    # dbt versioned models: bare name → latest version's node name
    # (ref('m') resolves here; ref('m', v=N) targets m_vN directly)
    version_aliases: dict = field(default_factory=dict)
    # from dbt_project.yml / profiles.yml when loading a standard dbt
    # project layout (recorded for introspection; Spark is the engine)
    profile: str | None = None
    target: str | None = None

    def node_names(self) -> set[str]:
        return set(self.models) | set(self.sources) | set(self.seeds)

    def version_of(self, node_name: str) -> tuple[str, int] | None:
        """(base_name, N) when node_name is a versioned-model node m_vN."""
        for base in self.version_aliases:
            m = re.fullmatch(re.escape(base) + r"_v(\d+)", node_name)
            if m:
                return base, int(m.group(1))
        return None

    def latest_version_num(self, base: str) -> int | None:
        alias = self.version_aliases.get(base)
        return int(alias.rsplit("_v", 1)[1]) if alias else None

    def topo_sort(self) -> list[str]:
        """Kahn's algorithm over model nodes, parents first; raises on cycles
        (reference algorithm: src/dbt_osmosis/core/node_filters.py:61-110)."""
        indeg: dict[str, int] = {}
        children: dict[str, list[str]] = {}
        for name, node in self.models.items():
            deps = [d for d in node.depends_on if d in self.models]
            indeg[name] = len(deps)
            for d in deps:
                children.setdefault(d, []).append(name)
        ready = sorted(n for n, d in indeg.items() if d == 0)
        out: list[str] = []
        while ready:
            n = ready.pop(0)
            out.append(n)
            for ch in sorted(children.get(n, [])):
                indeg[ch] -= 1
                if indeg[ch] == 0:
                    ready.append(ch)
            ready.sort()
        if len(out) != len(indeg):
            cyclic = sorted(set(indeg) - set(out))
            raise ValueError(f"dependency cycle among models: {cyclic}")
        return out

    def check_access(self) -> None:
        """dbt model-governance enforcement (v1.5 groups/access): a
        ref() edge into an access='private' model from outside its group
        is a build error. Static — walks the extracted dependency edges,
        so SQL and python models are covered identically."""
        for name, node in self.models.items():
            for dep in node.depends_on:
                target = self.models.get(dep)
                if target is None or target.access != "private":
                    continue
                if (node.group or None) != (target.group or None):
                    raise ValueError(
                        f"model '{name}' (group={node.group!r}) cannot ref "
                        f"private model '{dep}' (group={target.group!r})"
                    )

    def topo_layers(self) -> list[list[str]]:
        """Kahn LEVELS: each layer's models depend only on earlier layers,
        so one layer's members can materialize concurrently (dbt `threads`
        semantics; runner.materialize threads>1)."""
        remaining = {
            name: {d for d in node.depends_on if d in self.models}
            for name, node in self.models.items()
        }
        layers: list[list[str]] = []
        done: set[str] = set()
        while remaining:
            ready = sorted(n for n, deps in remaining.items() if deps <= done)
            if not ready:
                raise ValueError(f"dependency cycle among models: {sorted(remaining)}")
            layers.append(ready)
            done |= set(ready)
            for n in ready:
                del remaining[n]
        return layers

    def ancestors(self, names: set[str]) -> set[str]:
        """Transitive model parents of `names` (models only), excluding
        `names` themselves."""
        out: set[str] = set()
        frontier = list(names)
        while frontier:
            n = frontier.pop()
            for d in self.models[n].depends_on:
                if d in self.models and d not in out and d not in names:
                    out.add(d)
                    frontier.append(d)
        return out

    def select(
        self, selectors: list[str], previous_state: dict[str, str] | None = None
    ) -> set[str]:
        """dbt-style node selection, union over selectors:

        - `name`    — that model
        - `name+`   — model and all descendants
        - `+name`   — model and all ancestors
        - `+name+`  — both closures
        - `tag:x`   — models carrying tag x
        - `state:modified[+]` — models changed vs `previous_state`
          fingerprints (state.py), optionally plus descendants

        (reference analog: the fqn/path/tag candidate predicates at
        src/dbt_osmosis/core/node_filters.py:113-150; graph operators are
        dbt-core selection syntax, re-implemented over our edge list)."""
        children: dict[str, list[str]] = {}
        for name, node in self.models.items():
            for d in node.depends_on:
                if d in self.models:
                    children.setdefault(d, []).append(name)

        def closure(start: str, edges: dict[str, list[str]] | None) -> set[str]:
            seen = {start}
            frontier = [start]
            while frontier:
                n = frontier.pop()
                nxt = (
                    edges.get(n, [])
                    if edges is not None
                    else [d for d in self.models[n].depends_on if d in self.models]
                )
                for m in nxt:
                    if m not in seen:
                        seen.add(m)
                        frontier.append(m)
            return seen

        out: set[str] = set()
        for sel in selectors:
            if sel.startswith("tag:"):
                tag = sel[4:]
                out |= {n for n, node in self.models.items() if tag in node.tags}
                continue
            if sel.startswith("path:"):
                # dbt path selector: models whose file lives under the prefix
                prefix = sel[5:].rstrip("/")
                out |= {
                    n
                    for n, node in self.models.items()
                    if node.path == prefix or node.path.startswith(prefix + "/")
                }
                continue
            if sel.startswith("config.materialized:"):
                mat = sel.split(":", 1)[1]
                out |= {n for n, node in self.models.items() if node.materialized == mat}
                continue
            if "exposure:" in sel:
                ename = sel.split("exposure:", 1)[1]
                exp = self.exposures.get(ename)
                if exp is None:
                    raise ValueError(f"unknown exposure in --select: {ename!r}")
                deps = [d for d in exp["depends_on"] if d in self.models]
                out |= set(deps)
                if sel.startswith("+"):
                    for d in deps:
                        out |= closure(d, None)
                continue
            if sel in ("state:modified", "state:modified+", "state:new", "state:new+"):
                if previous_state is None:
                    raise ValueError(f"{sel.rstrip('+')} requires a --state fingerprint file")
                from dbt_osmosis_spark.state import modified_models

                if sel.startswith("state:new"):
                    # dbt state:new — models with no previous fingerprint
                    changed = {
                        n for n in self.models if f"model:{n}" not in previous_state
                    }
                else:
                    changed = modified_models(self, previous_state)
                out |= changed
                if sel.endswith("+"):
                    for name in changed:
                        out |= closure(name, children)
                continue
            plus_pre = sel.startswith("+")
            plus_post = sel.endswith("+")
            name = sel.strip("+")
            if name.startswith("source:"):
                # dbt `source:src.table[+]` — same resolution as a bare
                # source key
                name = name[len("source:") :]
                if name not in self.sources:
                    raise ValueError(f"unknown source in --select: {name!r}")
            if name not in self.models:
                if name in self.seeds or name in self.sources:
                    # dbt selectors accept seeds/sources; seeds and sources
                    # always register here (cheap lazy views), so selecting
                    # one contributes its model descendants under `name+`
                    # and nothing otherwise
                    if plus_post:
                        # readers plus their descendants (closure includes
                        # the reader itself)
                        for n, node in self.models.items():
                            if name in node.depends_on:
                                out |= closure(n, children)
                    continue
                raise ValueError(f"unknown model in --select: {name!r}")
            out.add(name)
            if plus_post:
                out |= closure(name, children)
            if plus_pre:
                out |= closure(name, None)
        return out

    def filter_models(
        self,
        fqn_prefix: str | None = None,
        path_prefix: str | None = None,
        tags: list[str] | None = None,
    ) -> Iterator[ModelNode]:
        """Candidate filtering (reference: node_filters.py:113-150)."""
        for name in self.topo_sort():
            node = self.models[name]
            if fqn_prefix and not name.startswith(fqn_prefix):
                continue
            if path_prefix and not node.path.startswith(path_prefix):
                continue
            if tags and not set(tags) & set(node.tags):
                continue
            yield node


def _scan_balanced(s: str, start: int) -> str | None:
    """Return the substring from `start` (just past an opening paren) to
    its matching close paren, respecting nesting and quoted strings."""
    depth = 1
    quote: str | None = None
    for i in range(start, len(s)):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
            if depth == 0:
                return s[start:i]
    return None


def _split_kwargs(arglist: str) -> list[str]:
    """Split config kwargs on top-level commas only: list literals like
    tags=['a', 'b'] stay intact, and commas INSIDE quoted strings (hook
    SQL like pre_hook='select 1, 2') never split."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    cur: list[str] = []
    for ch in arglist:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "[({":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _parse_inline_config(sql: str, config_re: re.Pattern | None = None) -> dict:
    """Extract `{{ config(materialized='table', ...) }}` kwargs
    (string/bool/int/list-of-string literals — enough for the reference's
    demo surface plus our materialization configs). Also parses python
    models' `dbt.config(...)` with the same literal grammar."""
    m = (config_re or _CONFIG_RE).search(sql)
    if not m:
        return {}
    # scan to the MATCHING close paren (depth + quote aware) — a naive
    # [^)]* regex truncates at the first ')' inside hook SQL like count(*)
    args = _scan_balanced(sql, m.end())
    if args is None:
        return {}

    def unquote(s: str) -> str:
        # strip ONE matching outer quote pair only — quotes inside the
        # literal (e.g. predicates like "day >= 'd2'") must survive
        s = s.strip()
        if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
            return s[1:-1]
        return s

    out: dict = {}
    for part in _split_kwargs(args):
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        v = v.strip()
        if v.startswith("{") and v.endswith("}"):
            # dict literal (e.g. dbt_osmosis_options={'prefix': 'x'})
            import ast

            try:
                out[k.strip()] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
        elif v.startswith("[") and v.endswith("]"):
            out[k.strip()] = [
                unquote(item) for item in v[1:-1].split(",") if item.strip()
            ]
        elif v.startswith(("'", '"')):
            out[k.strip()] = unquote(v)
        elif v.lower() in ("true", "false"):
            out[k.strip()] = v.lower() == "true"
        elif v.lstrip("-").isdigit():
            out[k.strip()] = int(v)
    return out


def _tree_configs(level: dict) -> dict:
    """Config keys at one level of dbt's hierarchical resource-config tree
    (`+key` is always a config; a bare non-dict value is dbt's lenient
    form — a dict value is a subdirectory)."""
    return {
        k.lstrip("+"): v
        for k, v in level.items()
        if k.startswith("+") or not isinstance(v, dict)
    }


def _resolve_config_tree(tree: dict, project_name: str, rel_parts: list[str]) -> dict:
    """Resolve dbt_project.yml's `models:` / `seeds:` config tree for a node
    under rel_parts (directories below the resource path root). dbt merge
    semantics: root < project < each directory level, deeper wins; the
    node's inline {{ config() }} wins over all of this (applied by caller).
    """
    out = _tree_configs(tree)
    level = tree.get(project_name)
    if not isinstance(level, dict):
        return out
    out.update(_tree_configs(level))
    for part in rel_parts:
        nxt = level.get(part)
        if not isinstance(nxt, dict):
            break
        level = nxt
        out.update(_tree_configs(level))
    return out


def _paths(cfg: dict, key: str, default: str) -> list[str]:
    v = cfg.get(key) or cfg.get(key.replace("-", "_")) or [default]
    return [v] if isinstance(v, str) else list(v)


def load_project(
    project_dir: str | Path,
    profiles_dir: str | Path | None = None,
    target: str | None = None,
) -> Manifest:
    """Parse a project directory into a Manifest (the reference's
    `create_dbt_project_context` analog, reference:
    src/dbt_osmosis/core/config.py:610-660 — minus dbt-core).

    Accepts TWO layouts:

    - **standard dbt project** (public dbt spec): `dbt_project.yml` with
      name/vars/resource paths and the hierarchical `models:`/`seeds:`
      config tree, `profiles.yml` (profile/target recorded; Spark is the
      engine), property files (`schema.yml`) with models/sources/seeds/
      exposures entries including versioned models, `snapshots/*.sql`
      {% snapshot %} blocks, and seeds as CSVs. A user points this engine
      at an existing dbt repo and it loads.
    - **native layout**: `project.yml` + `sources.yml` (path-explicit
      sources), as used by this repo's demo project.

    ``profiles_dir`` overrides where `profiles.yml` is read from (dbt's
    --profiles-dir; default is the project directory, matching dbt's
    project-local profile lookup). ``target`` overrides the profile's
    default target (dbt's --target); both are metadata here — Spark is
    always the engine.
    """
    project_dir = Path(project_dir)
    manifest = Manifest()

    dbt_layout = (project_dir / "dbt_project.yml").exists()
    proj_file = project_dir / ("dbt_project.yml" if dbt_layout else "project.yml")
    cfg: dict = {}
    if proj_file.exists() and _pyyaml is not None:
        cfg = _pyyaml.safe_load(proj_file.read_text()) or {}
    manifest.project_name = cfg.get("name", project_dir.name)
    manifest.vars = cfg.get("vars", {}) or {}

    def _hooks(key: str) -> list[str]:
        v = cfg.get(key) or cfg.get(key.replace("-", "_")) or []
        return [v] if isinstance(v, str) else list(v)

    manifest.on_run_start = _hooks("on-run-start")
    manifest.on_run_end = _hooks("on-run-end")

    model_paths = _paths(cfg, "model-paths", "models")
    seed_paths = _paths(cfg, "seed-paths", "seeds")
    macro_paths = _paths(cfg, "macro-paths", "macros")
    snapshot_paths = _paths(cfg, "snapshot-paths", "snapshots")
    models_tree: dict = (cfg.get("models") or {}) if dbt_layout else {}
    seeds_tree: dict = (cfg.get("seeds") or {}) if dbt_layout else {}
    seed_configs: dict = {} if dbt_layout else (cfg.get("seeds", {}) or {})

    manifest.profile = cfg.get("profile")
    prof_file = (Path(profiles_dir) if profiles_dir else project_dir) / "profiles.yml"
    if profiles_dir is not None and not prof_file.exists():
        # an explicit --profiles-dir pointing nowhere must fail loudly
        # (dbt errors when the profile cannot be found), never degrade to
        # target=None indistinguishable from success
        raise ValueError(f"--profiles-dir: no profiles.yml at {prof_file}")
    if manifest.profile and prof_file.exists() and _pyyaml is not None:
        pcfg = _pyyaml.safe_load(prof_file.read_text()) or {}
        prof = pcfg.get(manifest.profile) or {}
        if profiles_dir is not None and not prof:
            raise ValueError(
                f"profile '{manifest.profile}' not found in {prof_file}"
            )
        manifest.target = prof.get("target")
    if target is not None:
        manifest.target = target

    def _add_source_entry(s: dict, tbl: dict) -> None:
        key = f"{s['name']}.{tbl['name']}"
        meta = {**(s.get("meta") or {}), **(tbl.get("meta") or {})}
        ext = tbl.get("external") or {}
        # a warehouse-native source has no file location — record it as
        # declared-only (path=None) so it stays visible to lineage/yaml and
        # source() resolution gives a named error instead of a generic
        # unresolved-ref KeyError; registration skips it
        path = tbl.get("path") or meta.get("path") or ext.get("location") or None
        manifest.sources[key] = SourceNode(
            name=key,
            path=path,
            format=tbl.get("format") or meta.get("format") or ext.get("file_format", "parquet"),
            schema=s.get("schema") or s.get("name"),
            description=tbl.get("description", ""),
            loaded_at_field=tbl.get("loaded_at_field") or s.get("loaded_at_field"),
            freshness=tbl.get("freshness") or s.get("freshness") or {},
        )

    src_file = project_dir / "sources.yml"
    if src_file.exists() and _pyyaml is not None:
        scfg = _pyyaml.safe_load(src_file.read_text()) or {}
        for s in scfg.get("sources", []):
            for tbl in s.get("tables", []):
                _add_source_entry(s, tbl)

    for sp in seed_paths:
        seeds_dir = project_dir / sp
        if not seeds_dir.is_dir():
            continue
        for f in sorted(seeds_dir.rglob("*.csv")):
            rel_parts = list(f.relative_to(seeds_dir).parent.parts)
            if dbt_layout:
                seed_cfg = _resolve_config_tree(seeds_tree, manifest.project_name, rel_parts)
            else:
                seed_cfg = seed_configs.get(f.stem) or {}
            manifest.seeds[f.stem] = SeedNode(
                name=f.stem,
                path=str(f),
                column_types=seed_cfg.get("column_types")
                or seed_cfg.get("+column_types")
                or {},
            )

    macro_src: list[str] = []
    for mp in macro_paths:
        macros_dir = project_dir / mp
        if macros_dir.is_dir():
            macro_src.extend(f.read_text() for f in sorted(macros_dir.rglob("*.sql")))
    manifest.macro_source = "\n".join(macro_src)

    # dbt snapshots: {% snapshot name %} body {% endsnapshot %} blocks; the
    # inline config carries strategy/unique_key/updated_at/check_cols
    for sp in snapshot_paths:
        snap_dir = project_dir / sp
        if not snap_dir.is_dir():
            continue
        for f in sorted(snap_dir.rglob("*.sql")):
            raw = f.read_text()
            for m in _SNAPSHOT_RE.finditer(raw):
                sname, body = m.group(1), m.group(2)
                scfg = _parse_inline_config(body)
                deps = _ref_deps(body) + [
                    f"{a}.{b}" for a, b in _SOURCE_RE.findall(body)
                ]
                manifest.models[sname] = ModelNode(
                    name=sname,
                    raw_sql=body.strip(),
                    path=os.path.relpath(f, project_dir),
                    materialized="snapshot",
                    depends_on=sorted(set(deps)),
                    config={**scfg, "materialized": "snapshot"},
                    tags=list(scfg.get("tags") or []),
                )

    versioned_entries: list[dict] = []
    for mp in model_paths:
        models_dir = project_dir / mp
        if not models_dir.is_dir():
            continue
        for f in sorted(models_dir.rglob("*.sql")):
            raw = f.read_text()
            inline_cfg = _parse_inline_config(raw)
            rel_parts = list(f.relative_to(models_dir).parent.parts)
            tree_cfg = (
                _resolve_config_tree(models_tree, manifest.project_name, rel_parts)
                if dbt_layout
                else {}
            )
            mcfg = {**tree_cfg, **inline_cfg}
            deps = _ref_deps(raw) + [f"{a}.{b}" for a, b in _SOURCE_RE.findall(raw)]
            # refs to seeds resolve by seed name too
            manifest.models[f.stem] = ModelNode(
                name=f.stem,
                raw_sql=raw,
                path=os.path.relpath(f, project_dir),
                materialized=mcfg.get("materialized", "view"),
                depends_on=sorted(set(deps)),
                config=mcfg,
                tags=list(mcfg.get("tags") or []),
                group=mcfg.get("group"),
                access=mcfg.get("access") or "protected",
                unrendered_config=dict(mcfg),
            )
        # python models: any models/*.py defining `def model(dbt, session)`
        # (dbt python-model contract). Config/deps extracted statically from
        # dbt.config / dbt.ref / dbt.source calls, as dbt's parser does.
        for f in sorted(models_dir.rglob("*.py")):
            raw = f.read_text()
            if "def model(" not in raw:
                continue
            pcfg = _parse_inline_config(raw, _PY_CONFIG_RE)
            deps = _PY_REF_RE.findall(raw) + [
                f"{a}.{b}" for a, b in _PY_SOURCE_RE.findall(raw)
            ]
            manifest.models[f.stem] = ModelNode(
                name=f.stem,
                raw_sql=raw,
                path=os.path.relpath(f, project_dir),
                materialized=pcfg.get("materialized", "table"),
                language="python",
                depends_on=sorted(set(deps)),
                config=pcfg,
                tags=list(pcfg.get("tags") or []),
            )

    # property files (dbt schema.yml spec): declared columns, contracts,
    # sources, seeds, exposures, versioned models — anywhere under the
    # model/seed paths
    if _pyyaml is not None:
        prop_files: list[Path] = []
        for rp in model_paths + seed_paths:
            d = project_dir / rp
            if d.is_dir():
                prop_files.extend(sorted(d.rglob("*.yml")) + sorted(d.rglob("*.yaml")))
        for f in prop_files:
            pcfg = _pyyaml.safe_load(f.read_text()) or {}
            if not isinstance(pcfg, dict):
                continue
            for s in pcfg.get("sources") or []:
                for tbl in s.get("tables") or []:
                    _add_source_entry(s, tbl)
            for entry in pcfg.get("seeds") or []:
                seed = manifest.seeds.get(entry.get("name", ""))
                if seed is None:
                    continue
                if entry.get("description"):
                    seed.description = entry["description"]
                ct = (entry.get("config") or {}).get("column_types") or {}
                seed.column_types = {**seed.column_types, **ct}
            for entry in pcfg.get("models") or []:
                if entry.get("versions"):
                    versioned_entries.append(entry)
                    continue
                node = manifest.models.get(entry.get("name", ""))
                if node is None:
                    continue
                node.columns = entry.get("columns") or []
                contract = (entry.get("config") or {}).get("contract") or {}
                node.contract = bool(contract.get("enforced"))
                if entry.get("description"):
                    node.description = entry["description"]
                node.group = entry.get("group") or (entry.get("config") or {}).get("group") or node.config.get("group")
                node.access = entry.get("access") or node.config.get("access") or "protected"
                if entry.get("meta"):
                    node.meta = {**node.meta, **entry["meta"]}
            for exp in pcfg.get("exposures") or []:
                deps = _ref_deps(" ".join((exp.get("depends_on") or [])))
                manifest.exposures[exp["name"]] = {
                    "type": exp.get("type", "dashboard"),
                    "owner": exp.get("owner") or {},
                    "description": exp.get("description", ""),
                    "depends_on": sorted(set(deps)),
                }

    # versioned models (dbt model versions spec): each version becomes its
    # own node `name_vN`; the defining file is `name_vN.sql` when present,
    # else the base `name.sql`; the bare name aliases to latest_version
    for entry in versioned_entries:
        name = entry["name"]
        # tolerate malformed version entries at load time: every command
        # goes through load_project, so a broken schema.yml must degrade to
        # "entry skipped" here and be REPORTED by validate_schema_doc
        # (version-missing-v / version-v-type), not crash run/test/list
        versions = [
            v
            for v in entry["versions"]
            if isinstance(v, dict) and str(v.get("v", "")).lstrip("-").isdigit()
        ]
        if not versions:
            continue
        nums = [int(v["v"]) for v in versions]
        latest_raw = entry.get("latest_version")
        latest = (
            int(latest_raw)
            if str(latest_raw or "").lstrip("-").isdigit()
            else max(nums)
        )
        # an out-of-range latest_version (e.g. 3 with only v1/v2 declared)
        # must not mint a dangling alias to a nonexistent node; degrade to
        # max(nums) — validate_schema_doc reports latest-version-invalid
        if latest not in nums:
            latest = max(nums)
        base = manifest.models.get(name)
        for vspec in versions:
            vnum = int(vspec["v"])
            vname = f"{name}_v{vnum}"
            defining = manifest.models.get(vname) or base
            if defining is None:
                continue
            vcfg = {**defining.config, **(vspec.get("config") or {})}
            manifest.models[vname] = ModelNode(
                name=vname,
                raw_sql=defining.raw_sql,
                path=defining.path,
                materialized=vcfg.get("materialized", defining.materialized),
                language=defining.language,
                depends_on=list(defining.depends_on),
                description=vspec.get("description") or entry.get("description", ""),
                config=vcfg,
                tags=list(defining.tags),
                columns=vspec.get("columns") or entry.get("columns") or [],
                contract=defining.contract,
                group=defining.group,
                access=entry.get("access") or defining.access,
                meta={**(entry.get("meta") or {}), **(vspec.get("meta") or {})},
                unrendered_config=dict(vcfg),
            )
        manifest.models.pop(name, None)
        manifest.version_aliases[name] = f"{name}_v{latest}"
    if manifest.version_aliases:
        # un-versioned refs to a versioned model depend on its latest version
        for node in manifest.models.values():
            node.depends_on = sorted(
                {manifest.version_aliases.get(d, d) for d in node.depends_on}
            )
        for exp in manifest.exposures.values():
            exp["depends_on"] = sorted(
                {manifest.version_aliases.get(d, d) for d in exp["depends_on"]}
            )
    return manifest
