"""Every registered query must hash-match its DuckDB oracle (the t2 gate),
or — when no oracle exists (non-SQL-expressible ops) — return rows."""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.operators import QUERIES, load_all
from dbt_osmosis_spark.oracle import check_parity

load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, sf_dir, duck, name):
    res = check_parity(spark, name, sf_dir, duck)
    assert res.ok, f"{name}: {res.issues}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
