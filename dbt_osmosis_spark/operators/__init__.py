"""Operator registry.

Each operator module registers (name, spark_builder, oracle_sql|None) via
``register``. ``__spark_entry__.py`` re-exports the registry for the driver:
spark_builder(spark, sf_dir) -> DataFrame, oracle_sql runs on DuckDB over the
same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: add a query builder (and optional DuckDB oracle SQL).

    The registered callable releases the previous operator's cached
    frames on entry (see ``operators.caching``): persisted intermediates
    survive exactly until the next query starts, so long-lived sessions
    never accumulate sketch/signature caches across operators.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
            from dbt_osmosis_spark.operators.caching import release_caches

            release_caches()
            return fn(spark, sf_dir)

        dispatch.__name__ = fn.__name__
        dispatch.__doc__ = fn.__doc__
        dispatch.__wrapped__ = fn
        QUERIES[name] = dispatch
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so its registrations run."""
    from dbt_osmosis_spark.operators import (  # noqa: F401
        dedup,
        dedup_ext,
        dedup_ext2,
        multimodal,
        multimodal_ext,
        pipeline,
        pipeline_ext,
        pipeline_ext2,
        pipeline_ext3,
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
        relational_ext5,
        retrieval,
        retrieval_ext,
        retrieval_ext2,
        retrieval_ext3,
        similarity,
        similarity_ext,
        similarity_ext2,
        similarity_ext3,
        similarity_ext4,
        similarity_ext5,
        text,
        text_ext,
        text_ext2,
        text_ext3,
        text_ext4,
    )
