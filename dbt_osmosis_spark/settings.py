"""Settings resolution chain + unified property access (SURVEY M18, M19).

The reference resolves per-node/per-column configuration through a strict
precedence chain with kebab/snake/prefixed/options-nested key variants
(reference: src/dbt_osmosis/core/introspection.py:826-1007; precedence doc
:834-864). Same contract here, re-expressed over our dataclass manifest:

Precedence (highest→lowest):
  1. column meta           — <key> variants, dbt-osmosis-<key>, options-nested
  2. node meta             — same variants
  3. node config           — prefixed/options-nested first, then direct key
  4. context settings      — the engine's dbt-osmosis.yml analog
  5. project vars          — under the "dbt-osmosis" namespace, then direct
  6. fallback

PropertyAccessor (reference: src/dbt_osmosis/core/introspection.py:1584-1949)
unifies "read property from manifest vs YAML docs" with jinja-detection for
the "auto" mode (prefer YAML unless the YAML value contains unrendered jinja).

Driver-side by design: settings are per-node metadata, not row data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

_MISSING = object()


def _key_variants(name: str) -> tuple[str, str]:
    """(kebab-case, snake_case) spellings of a setting name."""
    return name.replace("_", "-"), name.replace("-", "_")


def _from_mapping(source: Any, name: str, *, direct: bool) -> Any:
    """Probe one mapping for a setting under all accepted spellings."""
    if not isinstance(source, Mapping):
        return _MISSING
    kebab, snake = _key_variants(name)
    for prefixed in (f"dbt-osmosis-{kebab}", f"dbt_osmosis_{snake}"):
        if prefixed in source:
            return source[prefixed]
    for options_key in ("dbt-osmosis-options", "dbt_osmosis_options"):
        options = source.get(options_key)
        if isinstance(options, Mapping):
            for k in (kebab, snake):
                if k in options:
                    return options[k]
    if direct:
        for k in (kebab, snake):
            if k in source:
                return source[k]
    return _MISSING


@dataclass
class SettingsResolver:
    """Chain-of-sources settings lookup (reference precedence doc:
    src/dbt_osmosis/core/introspection.py:834-864).

    Tiers, highest → lowest:

    1. column meta + column config.meta    (all spellings, direct keys)
    2. node meta                           (property-file `meta:`; direct keys)
    3. node config, prefixed/options only  (`dbt-osmosis-<key>`, options maps —
                                            bare keys in config do NOT resolve,
                                            matching the reference)
    4. node config.meta                    (dbt 1.10+ `config: {meta: ...}`)
    5. node unrendered_config              (dbt 1.10+ pre-render config values)
    6. explicit context settings           (code/CLI-supplied overrides)
    7. supplementary file                  (dbt-osmosis.yml contents)
    8. project vars                        ("dbt-osmosis" namespace, then
                                            prefixed top-level keys)
    9. fallback
    """

    context_settings: Mapping | None = None
    supplementary: Mapping | None = None
    project_vars: Mapping | None = None

    def resolve(
        self,
        name: str,
        *,
        node: Any | None = None,
        column: Mapping | None = None,
        fallback: Any = None,
    ) -> Any:
        if column is not None:
            # effective column meta: meta: plus dbt 1.10+ config.meta
            for cmeta in (
                column.get("meta"),
                (column.get("config") or {}).get("meta")
                if isinstance(column.get("config"), Mapping)
                else None,
            ):
                got = _from_mapping(cmeta, name, direct=True)
                if got is not _MISSING:
                    return got
        if node is not None:
            got = _from_mapping(getattr(node, "meta", None), name, direct=True)
            if got is not _MISSING:
                return got
            node_config = getattr(node, "config", None) or {}
            got = _from_mapping(node_config, name, direct=False)
            if got is not _MISSING:
                return got
            got = _from_mapping(node_config.get("meta"), name, direct=True)
            if got is not _MISSING:
                return got
            got = _from_mapping(
                getattr(node, "unrendered_config", None), name, direct=True
            )
            if got is not _MISSING:
                return got
        for source in (self.context_settings, self.supplementary):
            got = _from_mapping(source, name, direct=True)
            if got is not _MISSING:
                return got
        if isinstance(self.project_vars, Mapping):
            namespaced = self.project_vars.get("dbt-osmosis") or self.project_vars.get(
                "dbt_osmosis"
            )
            got = _from_mapping(namespaced, name, direct=True)
            if got is not _MISSING:
                return got
            got = _from_mapping(self.project_vars, name, direct=False)
            if got is not _MISSING:
                return got
        return fallback


def has_unrendered_jinja(value: Any) -> bool:
    """True when a YAML value still contains jinja markup — such values must
    not win over rendered manifest values in "auto" mode (reference:
    src/dbt_osmosis/core/introspection.py:1751-1793)."""
    if not isinstance(value, str):
        return False
    return ("{{" in value and "}}" in value) or ("{%" in value and "%}" in value)


@dataclass
class PropertyAccessor:
    """Unified manifest-vs-YAML property reads (SURVEY M19).

    ``manifest_props``/``yaml_props`` are per-node dicts: node → property →
    value. ``source`` is "manifest", "yaml", or "auto" (YAML wins unless its
    value has unrendered jinja or is empty).
    """

    manifest_props: dict[str, dict] = field(default_factory=dict)
    yaml_props: dict[str, dict] = field(default_factory=dict)
    source: str = "auto"

    def get(self, node: str, prop: str, default: Any = None) -> Any:
        from_manifest = (self.manifest_props.get(node) or {}).get(prop)
        from_yaml = (self.yaml_props.get(node) or {}).get(prop)
        if self.source == "manifest":
            return from_manifest if from_manifest is not None else default
        if self.source == "yaml":
            return from_yaml if from_yaml is not None else default
        if from_yaml is not None and from_yaml != "" and not has_unrendered_jinja(from_yaml):
            return from_yaml
        if from_manifest is not None:
            return from_manifest
        return from_yaml if from_yaml is not None else default
