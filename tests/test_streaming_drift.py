"""Continuous drift monitoring (streaming/drift.py): twin equivalence
against q85 plus the exactly-once replay contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all
from dbt_osmosis_spark.sources.parquet import read_parquet
from dbt_osmosis_spark.streaming.drift import (
    drift_alarms,
    run_drift_maintenance,
    write_batch_counts,
)

load_all()


def _split_events(spark, sf_dir, incoming, tmp_path, n_files=3):
    import glob
    import os
    import shutil

    os.makedirs(incoming, exist_ok=True)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    for k in range(n_files):
        stage = str(tmp_path / f"stage{k}")
        ev.filter(F.col("event_id") % n_files == k).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{incoming}/batch{k}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + k, 1_000_000 + k))
    return ev


def test_streamed_alarms_equal_q85(spark, sf_dir, tmp_path):
    incoming = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _split_events(spark, sf_dir, incoming, tmp_path)
    run_drift_maintenance(incoming, state, ckpt, spark)

    got = drift_alarms(spark, state).collect()
    want = QUERIES["q85_cusum_drift"](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    incoming = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ev = _split_events(spark, sf_dir, incoming, tmp_path)
    run_drift_maintenance(incoming, state, ckpt, spark)

    before = drift_alarms(spark, state).collect()
    total_before = spark.read.parquet(state).agg(F.sum("x")).collect()[0][0]

    # crash-replay: batch 2 re-runs with the same id and input slice
    write_batch_counts(ev.filter(F.col("event_id") % 3 == 2), state, 2)

    after = drift_alarms(spark, state).collect()
    total_after = spark.read.parquet(state).agg(F.sum("x")).collect()[0][0]
    assert total_after == total_before == ev.count()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
