"""Versioned-model YAML sync and fail-closed duplicate guards
(reference behavior: src/dbt_osmosis/core/sync_operations.py:535-655,
pinned there by tests/test_yaml_inheritance.py)."""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.project import ModelNode, Manifest
from dbt_osmosis_spark.transforms import (
    YamlRefactorContext,
    load_docs_from_yaml,
    sync_to_yaml,
)
from dbt_osmosis_spark.yaml_engine import (
    YamlSyncError,
    ensure_version_entry,
    model_entry,
    version_entry,
)


def _versioned_ctx(tmp_path):
    m = Manifest(project_name="p")
    for v in (1, 2):
        m.models[f"stg_x_v{v}"] = ModelNode(
            name=f"stg_x_v{v}", raw_sql="select 1 as a", path=f"models/stg_x_v{v}.sql"
        )
    m.version_aliases["stg_x"] = "stg_x_v2"
    (tmp_path / "models").mkdir(exist_ok=True)
    ctx = YamlRefactorContext(spark=None, manifest=m, project_dir=str(tmp_path))
    return ctx


def test_duplicate_model_entries_fail_closed():
    doc = {"models": [{"name": "m"}, {"name": "other"}, {"name": "m"}]}
    with pytest.raises(YamlSyncError, match="indexes 0, 2"):
        model_entry(doc, "m")


def test_duplicate_version_entries_fail_closed():
    entry = {"name": "m", "versions": [{"v": 1}, {"v": "1"}]}
    with pytest.raises(YamlSyncError, match="v='1'"):
        version_entry(entry, 1)
    # and ensure_* must not silently append a third copy
    with pytest.raises(YamlSyncError):
        ensure_version_entry(entry, 1)


def test_version_identity_matches_validator(tmp_path):
    """The sync guard keys on the same float-canonical identity as
    schema_validation._version_key (ADVICE r2): 'v: 1' and 'v: 1.0' are the
    SAME version — the guard must trip, and a float lookup must hit the int
    entry instead of appending a duplicate."""
    with pytest.raises(YamlSyncError, match="consolidate"):
        version_entry({"name": "m", "versions": [{"v": 1}, {"v": 1.0}]}, 1)
    entry = {"name": "m", "versions": [{"v": 1, "columns": [{"name": "a"}]}]}
    assert version_entry(entry, 1.0) is entry["versions"][0]
    assert ensure_version_entry(entry, "1") is entry["versions"][0]
    assert len(entry["versions"]) == 1


def test_versioned_sync_round_trip(tmp_path):
    ctx = _versioned_ctx(tmp_path)
    ctx.columns_of["stg_x_v1"] = {"a": {"description": "the a column (v1)"}}
    ctx.columns_of["stg_x_v2"] = {"a": {"description": "the a column (v2)"}}
    paths = sync_to_yaml(ctx)
    # both versions share ONE property file keyed by the base name
    assert len({p.name for p in paths}) == 1 and paths[0].name == "stg_x.yml"
    doc = ctx.yaml.read(paths[0])
    assert len(doc["models"]) == 1
    entry = doc["models"][0]
    assert entry["name"] == "stg_x"
    assert entry["latest_version"] == 2
    assert {v["v"] for v in entry["versions"]} == {1, 2}

    # round-trip: a fresh context loads per-version docs back
    ctx2 = _versioned_ctx(tmp_path)
    load_docs_from_yaml(ctx2)
    assert ctx2.columns_of["stg_x_v1"]["a"]["description"] == "the a column (v1)"
    assert ctx2.columns_of["stg_x_v2"]["a"]["description"] == "the a column (v2)"


def test_versioned_sync_preserves_user_entries(tmp_path):
    """Syncing v2 must not clobber the user-authored v1 entry."""
    ctx = _versioned_ctx(tmp_path)
    p = tmp_path / "models" / "stg_x.yml"
    ctx.yaml.write(
        p,
        {
            "version": 2,
            "models": [
                {
                    "name": "stg_x",
                    "versions": [
                        {"v": 1, "columns": [{"name": "a", "description": "hand-written"}]}
                    ],
                }
            ],
        },
    )
    ctx.columns_of["stg_x_v2"] = {"a": {"description": "generated"}}
    sync_to_yaml(ctx, node="stg_x_v2")
    doc = ctx.yaml.read(p)
    vs = {v["v"]: v for v in doc["models"][0]["versions"]}
    assert vs[1]["columns"][0]["description"] == "hand-written"
    assert vs[2]["columns"][0]["description"] == "generated"


def test_sync_refuses_ambiguous_document(tmp_path):
    ctx = _versioned_ctx(tmp_path)
    p = tmp_path / "models" / "stg_x.yml"
    ctx.yaml.write(
        p,
        {"version": 2, "models": [{"name": "stg_x"}, {"name": "stg_x"}]},
    )
    ctx.columns_of["stg_x_v1"] = {"a": {"description": "d"}}
    with pytest.raises(YamlSyncError):
        sync_to_yaml(ctx, node="stg_x_v1")
