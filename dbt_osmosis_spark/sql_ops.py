"""Compile + execute ad-hoc SQL (SURVEY M1/M2).

The reference's `execute_sql_code` compiles when Jinja is present, then
`adapter.execute(sql, fetch=True)` against the warehouse (reference:
src/dbt_osmosis/core/sql_operations.py:60-71). Spark is the warehouse here:
the result is a *lazy DataFrame* — callers decide whether to show(50) (the
CLI cap, reference: src/dbt_osmosis/cli/main.py:1650-1656), write, or chain.
No agate row materialization: at 100 TB the result of a model is itself a
distributed relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_osmosis_spark.compile import CompiledSQL, JinjaCompiler, has_jinja
from dbt_osmosis_spark.project import Manifest


def compile_sql_code(
    manifest: Manifest, sql: str, extra_vars: dict | None = None, spark: SparkSession | None = None
) -> CompiledSQL:
    return JinjaCompiler(manifest, spark=spark).compile(sql, extra_vars)


def execute_sql_code(
    spark: SparkSession,
    manifest: Manifest,
    sql: str,
    extra_vars: dict | None = None,
) -> tuple[CompiledSQL, DataFrame]:
    """Compile (if Jinja) then execute on Spark. Relations named by
    ref()/source() must already be registered (see runner.materialize)."""
    if has_jinja(sql):
        compiled = compile_sql_code(manifest, sql, extra_vars, spark=spark)
    else:
        compiled = CompiledSQL(raw_sql=sql, compiled_sql=sql)
    return compiled, spark.sql(compiled.compiled_sql)
