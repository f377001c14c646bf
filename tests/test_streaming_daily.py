"""Continuous daily-revenue maintenance (streaming/daily.py): twin
equivalence against q89 plus the exactly-once replay contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all
from dbt_osmosis_spark.sources.parquet import read_parquet
from dbt_osmosis_spark.streaming.daily import (
    run_daily_maintenance,
    write_batch_daily,
    yoy_report,
)

load_all()


def _split_lineitem(spark, sf_dir, incoming, tmp_path, n_files=3):
    import glob
    import os
    import shutil

    os.makedirs(incoming, exist_ok=True)
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_linenumber"
    )
    for k in range(n_files):
        stage = str(tmp_path / f"stage{k}")
        li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % n_files == k).drop(
            "l_linenumber"
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{incoming}/batch{k}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + k, 1_000_000 + k))
    return li


def test_streamed_yoy_equals_q89(spark, sf_dir, tmp_path):
    incoming = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _split_lineitem(spark, sf_dir, incoming, tmp_path)
    run_daily_maintenance(
        incoming, f"{sf_dir}/orders.parquet", state, ckpt, spark
    )

    got = yoy_report(spark, state).collect()
    want = QUERIES["q89_weekday_aligned_yoy"](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    incoming = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    li = _split_lineitem(spark, sf_dir, incoming, tmp_path)
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    run_daily_maintenance(
        incoming, f"{sf_dir}/orders.parquet", state, ckpt, spark
    )

    before = yoy_report(spark, state).collect()
    total_before = spark.read.parquet(state).agg(F.sum("rev_c")).collect()[0][0]

    # crash-replay: batch 2 re-runs with the same id and input slice
    write_batch_daily(
        li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 3 == 2).drop(
            "l_linenumber"
        ),
        orders,
        state,
        2,
    )

    after = yoy_report(spark, state).collect()
    total_after = spark.read.parquet(state).agg(F.sum("rev_c")).collect()[0][0]
    assert total_after == total_before
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
