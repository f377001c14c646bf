"""Settings-chain precedence cases ported from the reference's resolver
suite (reference: tests/core/test_settings_resolver.py; chain spec at
src/dbt_osmosis/core/introspection.py:834-864)."""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.settings import SettingsResolver


class _Node:
    def __init__(self, meta=None, config=None, unrendered_config=None):
        self.meta = meta or {}
        self.config = config or {}
        self.unrendered_config = unrendered_config or {}


@pytest.fixture
def sample_node() -> _Node:
    return _Node(
        meta={
            "string-length": True,
            "dbt-osmosis-string-length": False,
            "dbt-osmosis-options": {"numeric-precision-and-scale": True},
            "dbt_osmosis_options": {"prefix": "test_"},
        },
        config={
            "skip-add-columns": False,
            "dbt-osmosis-skip-add-tags": True,
            "dbt_osmosis_skip_add_tags": False,
            "dbt-osmosis-options": {"output-to-lower": True},
        },
    )


def test_resolve_with_no_node():
    assert SettingsResolver().resolve("string-length", fallback=True) is True


def test_resolve_with_no_matching_setting(sample_node):
    assert (
        SettingsResolver().resolve("unknown-setting", node=sample_node, fallback="default")
        == "default"
    )


def test_column_prefixed_beats_direct(sample_node):
    col = {"meta": {"output-to-lower": True, "dbt-osmosis-output-to-lower": False}}
    got = SettingsResolver().resolve(
        "output-to-lower", node=sample_node, column=col, fallback=False
    )
    assert got is False  # prefixed variant wins inside column meta


def test_column_config_meta_over_node_settings():
    node = _Node(
        meta={"dbt-osmosis-output-to-lower": False},
        config={"dbt-osmosis-options": {"output-to-lower": False}},
    )
    col = {"config": {"meta": {"dbt-osmosis-options": {"output-to-lower": True}}}}
    got = SettingsResolver().resolve("output-to-lower", node=node, column=col, fallback=False)
    assert got is True


def test_column_without_setting_falls_to_node(sample_node):
    col = {"meta": {"dbt_osmosis_prefix": "col_"}}
    got = SettingsResolver().resolve(
        "output-to-lower", node=sample_node, column=col, fallback=False
    )
    assert got is True  # from node config dbt-osmosis-options


def test_node_meta_prefixed_beats_direct(sample_node):
    assert SettingsResolver().resolve("string-length", node=sample_node, fallback=None) is False


def test_node_config_direct_keys_do_not_resolve(sample_node):
    # bare keys in config are NOT settings (reference contract) — only
    # prefixed / options-nested spellings count there
    assert (
        SettingsResolver().resolve("skip-add-columns", node=sample_node, fallback=True)
        is True
    )


def test_node_config_prefixed_resolves(sample_node):
    assert SettingsResolver().resolve("skip-add-tags", node=sample_node, fallback=None) is True


def test_kebab_snake_equivalence(sample_node):
    sample_node.meta["snake_case_setting"] = "snake-value"
    r = SettingsResolver()
    assert r.resolve("snake-case-setting", node=sample_node) == "snake-value"
    assert r.resolve("snake_case_setting", node=sample_node) == "snake-value"


def test_options_object_support(sample_node):
    got = SettingsResolver().resolve(
        "numeric-precision-and-scale", node=sample_node, fallback=None
    )
    assert got is True


def test_unrendered_config_tier():
    # a config value rendered away at parse time still resolves from
    # unrendered_config (dbt 1.10+), below config.meta, above context
    node = _Node(
        config={},
        unrendered_config={"dbt-osmosis-prefix": "{{ var('p') }}"},
    )
    r = SettingsResolver(context_settings={"prefix": "from-ctx"})
    assert r.resolve("prefix", node=node) == "{{ var('p') }}"
    # config.meta outranks unrendered_config
    node.config = {"meta": {"prefix": "from-config-meta"}}
    assert r.resolve("prefix", node=node) == "from-config-meta"


def test_explicit_vs_supplementary_vs_vars_tiers():
    r = SettingsResolver(
        context_settings={"sort-by": "explicit"},
        supplementary={"sort-by": "from-file", "skip-add-tags": True},
        project_vars={"dbt-osmosis": {"sort-by": "from-vars", "prefix": "v_"}},
    )
    assert r.resolve("sort_by") == "explicit"
    assert r.resolve("skip_add_tags") is True  # file tier
    assert r.resolve("prefix") == "v_"  # vars tier
    r2 = SettingsResolver(
        supplementary={"sort-by": "from-file"},
        project_vars={"dbt-osmosis": {"sort-by": "from-vars"}},
    )
    assert r2.resolve("sort_by") == "from-file"


def test_context_setting_for_helper(tmp_path):
    from dbt_osmosis_spark.project import load_project
    from dbt_osmosis_spark.transforms import YamlRefactorContext

    (tmp_path / "models").mkdir()
    (tmp_path / "project.yml").write_text(
        "name: p\nvars:\n  dbt-osmosis:\n    sort-by: from-vars\n    prefix: v_\n"
    )
    (tmp_path / "dbt-osmosis.yml").write_text("sort-by: from-file\n")
    (tmp_path / "models" / "m.sql").write_text(
        "{{ config(dbt_osmosis_options={'prefix': 'node_'}) }}\nselect 1 as a"
    )
    m = load_project(tmp_path)
    ctx = YamlRefactorContext(
        spark=None, manifest=m, project_dir=str(tmp_path), settings={"sort_by": "explicit"}
    )
    # explicit > dbt-osmosis.yml > project vars, node-level wins over all
    assert ctx.setting_for("sort-by") == "explicit"
    assert ctx.setting_for("prefix", node_name="m") == "node_"
    assert ctx.setting_for("prefix") == "v_"
    ctx2 = YamlRefactorContext(spark=None, manifest=m, project_dir=str(tmp_path))
    assert ctx2.setting_for("sort-by") == "from-file"
