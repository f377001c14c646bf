"""Incremental materialization: append / merge / insert_overwrite, with the
`is_incremental()` + `{{ this }}` compile contract."""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.project import load_project
from dbt_osmosis_spark.runner import materialize


def _project(tmp_path, model_sql: str, name="inc_model"):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text("name: incdemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: feed\n    path: {tmp_path}/feed.parquet\n"
    )
    (proj / "models" / f"{name}.sql").write_text(model_sql)
    return proj


def _write_feed(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "id long, day string, v double")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/feed.parquet")


APPEND_SQL = """
{{ config(materialized='incremental', incremental_strategy='append') }}
select id, day, v from {{ source('raw', 'feed') }}
{% if is_incremental() %} where id > (select max(id) from {{ this }}) {% endif %}
"""


def test_incremental_append_only_new_rows(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0)])
    proj = _project(tmp_path, APPEND_SQL)
    wh = str(tmp_path / "wh")

    r1 = materialize(spark, load_project(proj), warehouse_dir=wh, count_rows=True)
    inc = [r for r in r1.results if r.name == "inc_model"][0]
    assert inc.materialized == "incremental(full build)" and inc.rows == 2

    # feed grows; old rows must not duplicate
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0), (3, "d2", 3.0)])
    r2 = materialize(spark, load_project(proj), warehouse_dir=wh, count_rows=True)
    inc2 = [r for r in r2.results if r.name == "inc_model"][0]
    assert inc2.materialized == "incremental(append)" and inc2.rows == 3
    assert "where id >" in inc2.compiled_sql


MERGE_SQL = """
{{ config(materialized='incremental', incremental_strategy='merge', unique_key='id') }}
select id, day, v from {{ source('raw', 'feed') }}
"""


def test_incremental_merge_upserts(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0)])
    proj = _project(tmp_path, MERGE_SQL)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    # id=2 updated, id=3 inserted
    _write_feed(spark, tmp_path, [(2, "d1", 20.0), (3, "d2", 3.0)])
    materialize(spark, load_project(proj), warehouse_dir=wh)
    got = {r.id: r.v for r in spark.table("inc_model").collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0}


OVERWRITE_SQL = """
{{ config(materialized='incremental', incremental_strategy='insert_overwrite', partition_by='day') }}
select id, day, v from {{ source('raw', 'feed') }}
"""


def test_incremental_insert_overwrite_replaces_partitions(spark, tmp_path):
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d2", 2.0)])
    proj = _project(tmp_path, OVERWRITE_SQL)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    # re-deliver day d2 only: d1 untouched, d2 replaced (idempotent backfill)
    _write_feed(spark, tmp_path, [(9, "d2", 9.0)])
    materialize(spark, load_project(proj), warehouse_dir=wh)
    got = {(r.id, r.day, r.v) for r in spark.table("inc_model").collect()}
    assert got == {(1, "d1", 1.0), (9, "d2", 9.0)}


def test_incremental_missing_config_errors(spark, tmp_path):
    bad = """
{{ config(materialized='incremental', incremental_strategy='merge') }}
select id, day, v from {{ source('raw', 'feed') }}
"""
    _write_feed(spark, tmp_path, [(1, "d1", 1.0)])
    proj = _project(tmp_path, bad)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)  # full build ok
    with pytest.raises(ValueError, match="unique_key"):
        materialize(spark, load_project(proj), warehouse_dir=wh)


# ---- SCD2 snapshots ---------------------------------------------------------


def test_snapshot_scd2_check_strategy(spark, tmp_path):
    """Full SCD2 lifecycle: initial build, then changed / unchanged /
    deleted / added keys each produce the right (valid_from, valid_to)."""
    proj = tmp_path / "sproj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: snapdemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: items\n    path: {tmp_path}/items.parquet\n"
    )
    model = proj / "models" / "items_snap.sql"
    wh = str(tmp_path / "wh")

    def snap(at: str):
        model.write_text(
            "{{ config(materialized='snapshot', unique_key='id', "
            f"snapshot_at='{at}') }}}}\n".replace("}}}}", "}}")
            + "select id, val from {{ source('raw', 'items') }}"
        )
        return materialize(spark, load_project(proj), warehouse_dir=wh)

    v1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, val string")
    v1.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/items.parquet")
    report = snap("2026-01-01 00:00:00")
    assert any(r.materialized == "snapshot" for r in report.results)
    rows = spark.table("items_snap").collect()
    assert len(rows) == 3 and all(r.dbt_valid_to is None for r in rows)

    v2 = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], "id long, val string")
    v2.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/items.parquet")
    snap("2026-02-01 00:00:00")
    hist = {
        (r.id, r.val, str(r.dbt_valid_from), r.dbt_valid_to and str(r.dbt_valid_to))
        for r in spark.table("items_snap").collect()
    }
    assert hist == {
        (1, "a", "2026-01-01 00:00:00", None),                        # unchanged
        (2, "b", "2026-01-01 00:00:00", "2026-02-01 00:00:00"),       # closed
        (2, "B", "2026-02-01 00:00:00", None),                        # new version
        (3, "c", "2026-01-01 00:00:00", "2026-02-01 00:00:00"),       # hard delete
        (4, "d", "2026-02-01 00:00:00", None),                        # added
    }

    # idempotent re-run at a later ts with identical data: nothing changes
    snap("2026-03-01 00:00:00")
    assert spark.table("items_snap").count() == 5


def test_snapshot_timestamp_strategy(spark, tmp_path):
    proj = tmp_path / "tproj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: snapdemo2\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: items\n    path: {tmp_path}/items2.parquet\n"
    )
    model = proj / "models" / "items_ts.sql"
    wh = str(tmp_path / "wh2")

    def snap(at: str):
        model.write_text(
            "{{ config(materialized='snapshot', unique_key='id', strategy='timestamp', "
            f"updated_at='upd', snapshot_at='{at}') }}}}\n".replace("}}}}", "}}")
            + "select id, val, upd from {{ source('raw', 'items') }}"
        )
        return materialize(spark, load_project(proj), warehouse_dir=wh)

    mk = lambda rows: spark.createDataFrame(rows, "id long, val string, upd timestamp")
    import datetime as dt

    t1, t2 = dt.datetime(2026, 1, 1), dt.datetime(2026, 1, 15)
    mk([(1, "a", t1), (2, "b", t1)]).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/items2.parquet"
    )
    snap("2026-01-01 00:00:00")
    # val changed but upd NOT advanced for 1 (ignored); upd advanced for 2 (tracked)
    mk([(1, "A", t1), (2, "B", t2)]).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/items2.parquet"
    )
    snap("2026-02-01 00:00:00")
    rows = spark.table("items_ts").collect()
    open_vals = {r.id: r.val for r in rows if r.dbt_valid_to is None}
    assert open_vals == {1: "a", 2: "B"}
    assert sum(1 for r in rows if r.dbt_valid_to is not None) == 1


# ---- microbatch ------------------------------------------------------------

MICROBATCH_SQL = """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', lookback=%d) }}
select id, ts, v from {{ source('raw', 'feed') }}
"""


def _write_ts_feed(spark, tmp_path, rows):
    from datetime import datetime

    df = spark.createDataFrame(
        [(i, datetime(2026, 1, d, h), v) for i, d, h, v in rows],
        "id long, ts timestamp, v double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/feed.parquet")


def test_microbatch_reprocesses_only_window(spark, tmp_path):
    """lookback=0: only the open (max) batch and newer are reprocessed —
    a stale change in a closed partition is NOT picked up, the open batch
    is rewritten, and new batches land. Partition grain = day."""
    _write_ts_feed(spark, tmp_path, [(1, 1, 5, 1.0), (2, 2, 6, 2.0)])
    proj = _project(tmp_path, MICROBATCH_SQL % 0)
    wh = str(tmp_path / "wh")
    r1 = materialize(spark, load_project(proj), warehouse_dir=wh, count_rows=True)
    inc = [r for r in r1.results if r.name == "inc_model"][0]
    assert inc.materialized == "incremental(full build)" and inc.rows == 2
    assert "event_batch" not in spark.table("inc_model").columns

    # day1 mutated (outside window), day2 mutated (open batch), day3 new
    _write_ts_feed(
        spark, tmp_path, [(1, 1, 5, 100.0), (2, 2, 6, 200.0), (3, 3, 7, 3.0)]
    )
    r2 = materialize(spark, load_project(proj), warehouse_dir=wh, count_rows=True)
    inc2 = [r for r in r2.results if r.name == "inc_model"][0]
    assert inc2.materialized == "incremental(microbatch)"
    got = {r.id: r.v for r in spark.table("inc_model").collect()}
    assert got == {1: 1.0, 2: 200.0, 3: 3.0}

    # idempotence: re-run with unchanged input changes nothing
    materialize(spark, load_project(proj), warehouse_dir=wh)
    assert {r.id: r.v for r in spark.table("inc_model").collect()} == got


def test_microbatch_lookback_widens_window(spark, tmp_path):
    """lookback=1 also reprocesses the last closed batch."""
    _write_ts_feed(spark, tmp_path, [(1, 1, 5, 1.0), (2, 2, 6, 2.0)])
    proj = _project(tmp_path, MICROBATCH_SQL % 1)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    _write_ts_feed(spark, tmp_path, [(1, 1, 5, 100.0), (2, 2, 6, 200.0)])
    materialize(spark, load_project(proj), warehouse_dir=wh)
    got = {r.id: r.v for r in spark.table("inc_model").collect()}
    assert got == {1: 100.0, 2: 200.0}


def test_microbatch_begin_bounds_first_build(spark, tmp_path):
    sql = """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', begin='2026-01-02') }}
select id, ts, v from {{ source('raw', 'feed') }}
"""
    _write_ts_feed(spark, tmp_path, [(1, 1, 5, 1.0), (2, 2, 6, 2.0), (3, 3, 7, 3.0)])
    proj = _project(tmp_path, sql)
    wh = str(tmp_path / "wh")
    r = materialize(spark, load_project(proj), warehouse_dir=wh, count_rows=True)
    inc = [x for x in r.results if x.name == "inc_model"][0]
    assert inc.rows == 2  # day1 excluded by begin


# ---- on_schema_change ------------------------------------------------------

STAR_SQL = """
{{ config(materialized='incremental', incremental_strategy='append'__EXTRA__) }}
select * from {{ source('raw', 'feed') }}
{% if is_incremental() %} where id > (select max(id) from {{ this }}) {% endif %}
"""


def _write_raw(spark, tmp_path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/feed.parquet"
    )


def test_on_schema_change_ignore_freezes_target(spark, tmp_path):
    _write_raw(spark, tmp_path, [(1, "d1", 1.0)], "id long, day string, v double")
    proj = _project(tmp_path, STAR_SQL.replace("__EXTRA__", ""))
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    # source gains a column; default policy drops it from the increment
    _write_raw(
        spark, tmp_path, [(1, "d1", 1.0, "x"), (2, "d2", 2.0, "y")],
        "id long, day string, v double, extra string",
    )
    materialize(spark, load_project(proj), warehouse_dir=wh)
    t = spark.table("inc_model")
    assert t.columns == ["id", "day", "v"] and t.count() == 2


def test_on_schema_change_fail_raises(spark, tmp_path):
    _write_raw(spark, tmp_path, [(1, "d1", 1.0)], "id long, day string, v double")
    proj = _project(tmp_path, STAR_SQL.replace("__EXTRA__", ", on_schema_change='fail'"))
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)
    _write_raw(
        spark, tmp_path, [(2, "d2", 2.0, "y")], "id long, day string, v double, extra string"
    )
    with pytest.raises(ValueError, match="on_schema_change"):
        materialize(spark, load_project(proj), warehouse_dir=wh)


def test_on_schema_change_append_new_columns(spark, tmp_path):
    _write_raw(spark, tmp_path, [(1, "d1", 1.0)], "id long, day string, v double")
    proj = _project(tmp_path, STAR_SQL.replace("__EXTRA__", ", on_schema_change='append_new_columns'"))
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)
    _write_raw(
        spark, tmp_path, [(1, "d1", 1.0, "x"), (2, "d2", 2.0, "y")],
        "id long, day string, v double, extra string",
    )
    materialize(spark, load_project(proj), warehouse_dir=wh)
    got = {r.id: r.extra for r in spark.table("inc_model").collect()}
    assert got == {1: None, 2: "y"}  # old rows null-filled by mergeSchema read


def test_on_schema_change_sync_all_columns_on_merge(spark, tmp_path):
    sql = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='id', on_schema_change='sync_all_columns') }}
select * from {{ source('raw', 'feed') }}
"""
    _write_raw(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0)], "id long, day string, v double")
    proj = _project(tmp_path, sql)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    # v removed, w added; id=2 upserted, id=3 new
    _write_raw(spark, tmp_path, [(2, "d2", 20), (3, "d3", 30)], "id long, day string, w long")
    materialize(spark, load_project(proj), warehouse_dir=wh)
    t = spark.table("inc_model")
    assert t.columns == ["id", "day", "w"]  # model's current schema adopted
    got = {r.id: r.w for r in t.collect()}
    assert got == {1: None, 2: 20, 3: 30}


# ---- merge refinements -----------------------------------------------------

def test_merge_update_columns_partial_update(spark, tmp_path):
    """merge_update_columns: matched rows take new values ONLY for the
    listed columns; everything else keeps the old value."""
    sql = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='id', merge_update_columns=['v']) }}
select id, day, v from {{ source('raw', 'feed') }}
"""
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0)])
    proj = _project(tmp_path, sql)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    # id=2 arrives with BOTH day and v changed; only v may update
    _write_feed(spark, tmp_path, [(2, "dX", 20.0), (3, "d3", 3.0)])
    materialize(spark, load_project(proj), warehouse_dir=wh)
    got = {r.id: (r.day, r.v) for r in spark.table("inc_model").collect()}
    assert got == {1: ("d1", 1.0), 2: ("d1", 20.0), 3: ("d3", 3.0)}


def test_merge_incremental_predicates_bound_the_window(spark, tmp_path):
    """incremental_predicates: rows outside the window pass through
    untouched — including dbt's documented footgun that an out-of-window
    key match is NOT deduplicated."""
    sql = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='id', incremental_predicates=["day >= 'd2'"]) }}
select id, day, v from {{ source('raw', 'feed') }}
"""
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d2", 2.0)])
    proj = _project(tmp_path, sql)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    # id=2 (in window) upserts; id=1 re-arrives but its old row is OUTSIDE
    # the window -> duplicate by contract
    _write_feed(spark, tmp_path, [(1, "d3", 100.0), (2, "d2", 20.0)])
    materialize(spark, load_project(proj), warehouse_dir=wh)
    rows = spark.table("inc_model").collect()
    assert sorted((r.id, r.day, r.v) for r in rows) == [
        (1, "d1", 1.0),   # untouched out-of-window original
        (1, "d3", 100.0), # new arrival (documented duplicate)
        (2, "d2", 20.0),  # in-window upsert
    ]


def test_full_refresh_rebuilds_and_respects_protection(spark, tmp_path):
    """--full-refresh drops and rebuilds incrementals — unless the model
    pins full_refresh=false (dbt's fat-table protection)."""
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0)])
    proj = _project(tmp_path, APPEND_SQL)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)

    # feed shrinks to one row; a normal run keeps history, full refresh
    # rebuilds from the current feed alone
    _write_feed(spark, tmp_path, [(9, "d9", 9.0)])
    r = materialize(spark, load_project(proj), warehouse_dir=wh, count_rows=True, full_refresh=True)
    inc = [x for x in r.results if x.name == "inc_model"][0]
    assert inc.materialized == "incremental(full build)" and inc.rows == 1

    protected = APPEND_SQL.replace(
        "incremental_strategy='append'", "incremental_strategy='append', full_refresh=false"
    )
    proj2 = _project(tmp_path, protected, name="inc_model")
    _write_feed(spark, tmp_path, [(1, "d1", 1.0)])
    materialize(spark, load_project(proj2), warehouse_dir=wh, full_refresh=True)
    # the protected model did NOT rebuild: row 9 from before still present
    ids = {r.id for r in spark.table("inc_model").collect()}
    assert 9 in ids


def test_read_only_materialize_never_mutates_warehouse(spark, tmp_path):
    """The test/profile/docs path: a blind-append incremental must NOT gain
    rows when the DAG is registered read-only, and refs must resolve to the
    accumulated warehouse state (not the bare query)."""
    import glob

    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0)])
    proj = _project(tmp_path, APPEND_SQL)
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)
    files_before = sorted(glob.glob(f"{wh}/inc_model.parquet/*"))

    r = materialize(spark, load_project(proj), warehouse_dir=wh, read_only=True)
    inc = [x for x in r.results if x.name == "inc_model"][0]
    assert inc.materialized == "incremental(existing)"
    assert sorted(glob.glob(f"{wh}/inc_model.parquet/*")) == files_before
    assert spark.table("inc_model").count() == 2

    # repeat: still no growth (the double-append bug this guards against)
    materialize(spark, load_project(proj), warehouse_dir=wh, read_only=True)
    assert spark.table("inc_model").count() == 2


def test_read_only_materialize_without_warehouse_state(spark, tmp_path):
    """Before any build exists, read-only registration falls back to a lazy
    view of the compiled body (incremental=False) so refs still resolve."""
    _write_feed(spark, tmp_path, [(1, "d1", 1.0)])
    proj = _project(tmp_path, APPEND_SQL)
    r = materialize(
        spark, load_project(proj), warehouse_dir=str(tmp_path / "wh2"), read_only=True
    )
    inc = [x for x in r.results if x.name == "inc_model"][0]
    assert inc.materialized == "view(read-only)"
    assert spark.table("inc_model").count() == 1


def test_unselected_incremental_ancestor_resolves_to_warehouse(spark, tmp_path):
    """dbt semantics: ref() on an unselected incremental ancestor sees the
    accumulated table, not a recompile of the bare query."""
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0)])
    proj = _project(tmp_path, APPEND_SQL)
    (proj / "models" / "downstream.sql").write_text(
        "select count(*) as n from {{ ref('inc_model') }}"
    )
    wh = str(tmp_path / "wh")
    materialize(spark, load_project(proj), warehouse_dir=wh)
    # grow the feed; select only the downstream — the ancestor must NOT
    # re-run (its bare recompile would show 3 feed rows; warehouse has 2)
    _write_feed(spark, tmp_path, [(1, "d1", 1.0), (2, "d1", 2.0), (3, "d2", 3.0)])
    r = materialize(
        spark, load_project(proj), warehouse_dir=wh, select=["downstream"]
    )
    anc = [x for x in r.results if x.name == "inc_model"][0]
    assert anc.materialized == "incremental(existing)"
    assert spark.table("downstream").collect()[0].n == 2


def test_swap_dirs_recovers_leftover_old(tmp_path):
    import os

    from dbt_osmosis_spark.runner import _swap_dirs

    out, tmp, old = tmp_path / "t.parquet", tmp_path / "t.parquet.tmp", tmp_path / "t.parquet.old"
    for d, marker in ((out, "old_data"), (tmp, "new_data"), (old, "crash_leftover")):
        d.mkdir()
        (d / marker).touch()
    _swap_dirs(str(out), str(tmp))
    assert (out / "new_data").exists()
    assert not tmp.exists() and not old.exists()
