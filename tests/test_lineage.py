"""Column-level lineage from Catalyst pruning: renamed and computed
columns trace to their true source columns across view chains — the case
the reference's name-matching knowledge graph cannot follow."""

from __future__ import annotations

from dbt_osmosis_spark.lineage import column_lineage, model_lineage, register_views
from dbt_osmosis_spark.project import load_project


STG_SQL = """
select id as order_id, amount_cents / 100.0 as amount, status
from {{ source('raw', 'orders_feed') }}
"""

FINAL_SQL = """
select c.name as customer_name,
       sum(s.amount) as total_amount
from {{ ref('stg_orders') }} s
join {{ source('raw', 'customers_feed') }} c on s.order_id = c.id
where s.status = 'ok'
group by c.name
"""


def _project(tmp_path):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True, exist_ok=True)
    (proj / "project.yml").write_text("name: lindemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: raw\n  tables:\n"
        f"  - name: orders_feed\n    path: {tmp_path}/orders_feed.parquet\n"
        f"  - name: customers_feed\n    path: {tmp_path}/customers_feed.parquet\n"
    )
    (proj / "models" / "stg_orders.sql").write_text(STG_SQL)
    (proj / "models" / "final").mkdir(exist_ok=True)
    (proj / "models" / "final" / "customer_totals.sql").write_text(FINAL_SQL)
    return proj


def _write_data(spark, tmp_path):
    spark.createDataFrame(
        [(1, 100, "ok"), (2, 250, "bad")], "id long, amount_cents long, status string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders_feed.parquet")
    spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id long, name string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customers_feed.parquet")


def test_renamed_and_computed_columns_trace_to_source(spark, tmp_path):
    _write_data(spark, tmp_path)
    manifest = load_project(_project(tmp_path))
    register_views(spark, manifest)

    # renamed: order_id ← id (name-matching would lose this edge)
    lin = column_lineage(spark, manifest, "stg_orders", "order_id")
    assert lin == {"raw.orders_feed": ["id"]}

    # computed: amount ← amount_cents
    lin = column_lineage(spark, manifest, "stg_orders", "amount")
    assert lin == {"raw.orders_feed": ["amount_cents"]}


def test_lineage_crosses_model_boundary_with_provenance(spark, tmp_path):
    _write_data(spark, tmp_path)
    manifest = load_project(_project(tmp_path))
    register_views(spark, manifest)

    lin = column_lineage(spark, manifest, "customer_totals", "total_amount")
    # value flows from amount_cents; provenance includes the join keys and
    # the status filter — columns that decide WHICH rows aggregate
    assert set(lin) == {"raw.orders_feed", "raw.customers_feed"}
    assert "amount_cents" in lin["raw.orders_feed"]
    assert "status" in lin["raw.orders_feed"]  # filter dependency
    assert "id" in lin["raw.orders_feed"]  # join key
    assert "id" in lin["raw.customers_feed"]

    full = model_lineage(spark, manifest, "customer_totals")
    assert set(full) == {"customer_name", "total_amount"}
    assert "name" in full["customer_name"]["raw.customers_feed"]


def test_lineage_cli(tmp_path, spark, capsys):
    from dbt_osmosis_spark.cli import main

    _write_data(spark, tmp_path)
    proj = _project(tmp_path)
    rc = main(["--project-dir", str(proj), "lineage", "stg_orders", "--column", "amount"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "stg_orders.amount" in out and "raw.orders_feed: amount_cents" in out
