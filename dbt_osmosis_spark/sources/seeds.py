"""CSV seed loading (SURVEY §2A S1).

The reference materializes seeds via ``dbt seed`` (reference:
tests/conftest.py:29-37, demo_duckdb/seeds/*.csv). Here a seed is a
header CSV loaded into a DataFrame and registered as a table/view.

Schema inference runs once at load (driver reads a sample); for production
callers pass an explicit ``schema`` — inference at 100 TB means an extra
full pass over the file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def load_seed(
    spark: SparkSession,
    path: str,
    name: str | None = None,
    schema: StructType | str | None = None,
    column_types: dict | None = None,
) -> DataFrame:
    """Load a header CSV; register as temp view ``name`` when given.

    ``column_types`` is dbt's seed config of the same name: per-column
    type overrides applied AT PARSE TIME (the overridden column is read
    from the raw CSV text with the declared type, so `zip: string` keeps
    its leading zeros — a post-inference cast would have destroyed them,
    which is exactly the bug this dbt config exists to fix)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if column_types:
        # re-read with an explicit schema: inferred types for untouched
        # columns, declared types for overridden ones
        fields = ", ".join(
            f"`{f.name}` {column_types.get(f.name, f.dataType.simpleString())}"
            for f in df.schema.fields
        )
        df = spark.read.option("header", True).schema(fields).csv(path)
    if name:
        df.createOrReplaceTempView(name)
    return df
