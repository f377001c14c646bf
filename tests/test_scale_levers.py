"""Skew salting + bucketed co-located joins — the two scale levers AQE
doesn't fully cover, with correctness AND plan-property assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_osmosis_spark.functions.skew import salted_agg, salted_broadcast_left
from dbt_osmosis_spark.plans.audit import exchange_count, physical_plan
from dbt_osmosis_spark.sources.parquet import read_parquet


def test_salted_agg_matches_plain(spark, sf_dir):
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    plain = {
        (r.o_orderstatus): (r.n, r.total)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    salted = {
        (r.o_orderstatus): (r.n, r.total)
        for r in salted_agg(
            o,
            ["o_orderstatus"],
            {
                "n": F.count(F.lit(1)),
                "total": F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
            },
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError):
        salted_agg(o, ["o_orderstatus"], {"a": F.avg("o_totalprice")}).collect()


def test_salted_broadcast_left_matches_plain_join(spark, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    cust = read_parquet(spark, f"{sf_dir}/customer.parquet").selectExpr(
        "c_custkey as o_custkey", "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_broadcast_left(orders, cust, "o_custkey").count()
    assert salted == plain


def test_bucketed_models_join_without_shuffle(spark, tmp_path):
    """Two models bucketed on the same key × count join with zero shuffle
    exchanges (broadcast disabled to force the sort-merge path)."""
    from dbt_osmosis_spark.project import load_project
    from dbt_osmosis_spark.runner import materialize

    proj = tmp_path / "bproj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: bucketdemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: tpch\n  tables:\n"
        "  - name: orders\n    path: /root/testdata/sf0.001/orders.parquet\n"
        "  - name: customer\n    path: /root/testdata/sf0.001/customer.parquet\n"
    )
    (proj / "models" / "orders_b.sql").write_text(
        "{{ config(materialized='table', bucket_by='o_custkey', buckets=4) }}\n"
        "select o_orderkey, o_custkey, o_totalprice from {{ source('tpch', 'orders') }}"
    )
    (proj / "models" / "cust_b.sql").write_text(
        "{{ config(materialized='table', bucket_by='c_custkey', buckets=4) }}\n"
        "select c_custkey, c_mktsegment from {{ source('tpch', 'customer') }}"
    )
    manifest = load_project(proj)
    report = materialize(spark, manifest)
    kinds = {r.name: r.materialized for r in report.results if r.kind == "model"}
    assert kinds["orders_b"] == "table(bucketed)"

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("cust_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        joined.collect()
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert exchange_count(joined) == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_partitioned_model_prunes_partitions(spark, tmp_path):
    """A filter on the partition_by column must become a PartitionFilter
    (directory pruning), not a row filter over the full scan."""
    from dbt_osmosis_spark.plans.audit import partition_filters
    from dbt_osmosis_spark.project import load_project
    from dbt_osmosis_spark.runner import materialize

    proj = tmp_path / "pproj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: partdemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: tpch\n  tables:\n"
        "  - name: orders\n    path: /root/testdata/sf0.001/orders.parquet\n"
    )
    (proj / "models" / "orders_p.sql").write_text(
        "{{ config(materialized='table', partition_by='o_orderstatus') }}\n"
        "select o_orderkey, o_totalprice, o_orderstatus from {{ source('tpch', 'orders') }}"
    )
    materialize(spark, load_project(proj), warehouse_dir=str(tmp_path / "wh"))
    pruned = spark.table("orders_p").filter(F.col("o_orderstatus") == "F")
    filters = partition_filters(pruned)
    assert any("o_orderstatus" in f for f in filters), filters
    full = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    expect = full.filter("o_orderstatus = 'F'").count()
    assert pruned.count() == expect


def test_sorted_model_writes_disjoint_zone_maps(spark, tmp_path):
    """sort_by: every written file owns a disjoint sort-key range (tight
    parquet min/max stats → row-group/file skipping on range filters)."""
    import glob

    import pyarrow.parquet as pq

    from dbt_osmosis_spark.project import load_project
    from dbt_osmosis_spark.runner import materialize

    proj = tmp_path / "sproj"
    (proj / "models").mkdir(parents=True)
    (proj / "project.yml").write_text("name: sortdemo\n")
    (proj / "sources.yml").write_text(
        "sources:\n- name: tpch\n  tables:\n"
        "  - name: orders\n    path: /root/testdata/sf0.001/orders.parquet\n"
    )
    (proj / "models" / "orders_s.sql").write_text(
        "{{ config(materialized='table', sort_by='o_totalprice', sort_files=4) }}\n"
        "select o_orderkey, o_totalprice from {{ source('tpch', 'orders') }}"
    )
    materialize(spark, load_project(proj), warehouse_dir=str(tmp_path / "wh"))

    ranges = []
    for f in glob.glob(str(tmp_path / "wh" / "orders_s.parquet" / "*.parquet")):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("o_totalprice")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1, "expected multiple output files"
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: ({lo_a},{hi_a}) vs ({lo_b},{hi_b})"

    # correctness unchanged by layout
    n = spark.table("orders_s").count()
    assert n == spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
