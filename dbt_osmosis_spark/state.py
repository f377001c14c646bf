"""Project state artifacts — dbt's `--state` workflow on this engine.

A state file is a fingerprint map of every node, written after a
successful run. `state:modified` selection compares the live manifest
against it and picks up models whose SQL/python body, config, declared
columns, or upstream seed/source definitions changed — the slim-CI
pattern (build only what changed plus its descendants) that keeps a
100 TB warehouse's CI from rebuilding the world.

(reference scope: dbt-osmosis consumes dbt's manifest but defers state
selection to dbt-core; this is the engine-native equivalent.)
"""

from __future__ import annotations

import hashlib
import json
import os

from dbt_osmosis_spark.project import Manifest


def _h(*parts: str) -> str:
    m = hashlib.sha256()
    for p in parts:
        m.update(p.encode())
        m.update(b"\x00")
    return m.hexdigest()


def fingerprint(manifest: Manifest) -> dict[str, str]:
    """Stable per-node content hashes. Models hash their body + config +
    declared columns; seeds hash file bytes (a seed edit must re-select
    its children); sources hash location + format."""
    fp: dict[str, str] = {}
    for name, node in manifest.models.items():
        fp[f"model:{name}"] = _h(
            node.language,
            node.raw_sql,
            json.dumps(node.config, sort_keys=True, default=str),
            json.dumps(node.columns, sort_keys=True, default=str),
            str(node.contract),
        )
    for name, seed in manifest.seeds.items():
        try:
            with open(seed.path, "rb") as f:
                content = hashlib.sha256(f.read()).hexdigest()
        except OSError:
            content = "missing"
        fp[f"seed:{name}"] = _h(content, json.dumps(seed.column_types, sort_keys=True))
    for key, src in manifest.sources.items():
        fp[f"source:{key}"] = _h(src.path or "<declared-only>", src.format)
    return fp


def write_state(manifest: Manifest, path: str) -> str:
    """Write state.json (atomically) into directory `path`; returns the
    file path."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "state.json")
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"fingerprints": fingerprint(manifest)}, f, indent=2, sort_keys=True)
    os.replace(tmp, out)
    return out


def load_state(path: str) -> dict[str, str]:
    """Load fingerprints from a state directory (or a state.json path)."""
    p = path if path.endswith(".json") else os.path.join(path, "state.json")
    with open(p) as f:
        return json.load(f)["fingerprints"]


def modified_models(manifest: Manifest, previous: dict[str, str]) -> set[str]:
    """Models that are new/changed vs `previous`, including models whose
    direct seed/source dependencies changed definition (a moved source
    path invalidates its consumers even though their SQL is unchanged)."""
    current = fingerprint(manifest)
    changed_nodes = {k for k, v in current.items() if previous.get(k) != v}
    out: set[str] = set()
    for name, node in manifest.models.items():
        if f"model:{name}" in changed_nodes:
            out.add(name)
            continue
        for dep in node.depends_on:
            if f"seed:{dep}" in changed_nodes or f"source:{dep}" in changed_nodes:
                out.add(name)
                break
    return out
