"""State fingerprints + state:modified selection (slim CI) and source
freshness (dbt source freshness analog)."""

from __future__ import annotations

from datetime import datetime

import pytest

from dbt_osmosis_spark.freshness import check_freshness
from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.runner import materialize
from dbt_osmosis_spark.state import load_state, modified_models, write_state


def _project(tmp_path):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text("name: statedemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed.parquet\n"
    )
    (proj / "models" / "stg.sql").write_text(
        "select id, v from {{ source('raw', 'feed') }}\n"
    )
    (proj / "models" / "agg.sql").write_text(
        "select count(*) as n, sum(v) as total from {{ ref('stg') }}\n"
    )
    (proj / "models" / "other.sql").write_text(
        "select 1 as one\n"
    )
    return proj


def _write_feed(spark, tmp_path):
    spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/feed.parquet")


def test_state_modified_selects_changed_and_descendants(spark, tmp_path):
    _write_feed(spark, tmp_path)
    proj = _project(tmp_path)
    manifest = load_project(proj)
    state_dir = str(tmp_path / "state")
    write_state(manifest, state_dir)
    prev = load_state(state_dir)

    # nothing changed → empty selection
    assert modified_models(load_project(proj), prev) == set()

    # edit stg → stg modified; state:modified+ pulls in its child agg
    (proj / "models" / "stg.sql").write_text(
        "select id, v * 2 as v from {{ source('raw', 'feed') }}\n"
    )
    m2 = load_project(proj)
    assert modified_models(m2, prev) == {"stg"}
    assert m2.select(["state:modified+"], prev) == {"stg", "agg"}
    assert m2.select(["state:modified"], prev) == {"stg"}

    # runner honors it: only stg+agg run with real materializations
    r = materialize(spark, m2, select=["state:modified+"], previous_state=prev)
    mats = {x.name: x.materialized for x in r.results if x.kind == "model"}
    assert mats["stg"] == "view" and mats["agg"] == "view"
    assert "other" not in mats  # untouched model skipped entirely


def test_state_source_change_invalidates_consumers(spark, tmp_path):
    _write_feed(spark, tmp_path)
    proj = _project(tmp_path)
    prev = load_state(write_state(load_project(proj), str(tmp_path / "state")))

    # moving the source's path must re-select its consumer model
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed2.parquet\n"
    )
    assert modified_models(load_project(proj), prev) == {"stg"}


def test_state_modified_requires_state():
    from dbt_osmosis_spark.project import Manifest

    with pytest.raises(ValueError, match="state:modified requires"):
        Manifest().select(["state:modified"])


FRESH_YML = """
sources:
- name: raw
  tables:
  - name: feed
    path: {path}
    loaded_at_field: ts
    freshness:
      warn_after: {{count: 1, period: hour}}
      error_after: {{count: 1, period: day}}
"""


def test_source_freshness_statuses(spark, tmp_path):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text("name: freshdemo\n")
    (proj / "sources.yml").write_text(
        FRESH_YML.format(path=f"{tmp_path}/feed.parquet")
    )
    spark.createDataFrame(
        [(1, datetime(2026, 8, 13, 10, 0, 0))], "id long, ts timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/feed.parquet")
    manifest = load_project(proj)
    assert manifest.sources["raw.feed"].loaded_at_field == "ts"

    r = check_freshness(spark, manifest, now=datetime(2026, 8, 13, 10, 30))[0]
    assert r.status == "pass" and r.age_seconds == 1800.0
    r = check_freshness(spark, manifest, now=datetime(2026, 8, 13, 13, 0))[0]
    assert r.status == "warn"
    r = check_freshness(spark, manifest, now=datetime(2026, 8, 15, 10, 0))[0]
    assert r.status == "error"


def test_exposures_parse_and_select(spark, tmp_path):
    """dbt exposures: declared downstream consumers parse from YAML and
    +exposure:name selects their model closure."""
    proj = _project(tmp_path)
    (proj / "models" / "exposures.yml").write_text(
        "exposures:\n"
        "- name: weekly_dash\n  type: dashboard\n"
        "  owner: {name: ops}\n"
        "  depends_on:\n"
        "  - \"{{ ref('agg') }}\"\n"
    )
    _write_feed(spark, tmp_path)
    manifest = load_project(proj)
    exp = manifest.exposures["weekly_dash"]
    assert exp["depends_on"] == ["agg"] and exp["type"] == "dashboard"
    assert manifest.select(["exposure:weekly_dash"]) == {"agg"}
    assert manifest.select(["+exposure:weekly_dash"]) == {"agg", "stg"}


def test_state_new_selector(tmp_path):
    """state:new selects only models absent from the previous
    fingerprints (dbt slim-CI: run just the newly added models)."""
    import shutil

    from dbt_osmosis_spark.project import load_project
    from dbt_osmosis_spark.state import fingerprint

    proj = tmp_path / "proj"
    shutil.copytree("/root/repo/demo_spark", proj)
    m = load_project(proj)
    prev = fingerprint(m)
    (proj / "models" / "brand_new.sql").write_text(
        "select * from {{ ref('stg_orders') }}\n"
    )
    m2 = load_project(proj)
    assert m2.select(["state:new"], prev) == {"brand_new"}
    # state:modified also includes it (new == modified-from-nothing)
    assert "brand_new" in m2.select(["state:modified"], prev)
