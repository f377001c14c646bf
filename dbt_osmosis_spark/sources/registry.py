"""Source-format registry: one dispatch for every place that opens an
external source (runner, lineage, freshness).

Formats: parquet (with nanosecond-timestamp normalization), csv
(header+infer), json (JSONL), orc. Formats with their own reader modules
(delta, iceberg, avro — avro's core jars ship with Spark but the
spark-avro DataSource module does not) route through
`spark.read.format(...)` when their packages are on the classpath —
gated with a clear error here because this container ships none of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_osmosis_spark.sources.parquet import read_parquet

_PLAIN_FORMATS = ("orc",)
_TABLE_FORMATS = ("delta", "iceberg", "avro")


def read_source(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    """Open an external source table by declared format."""
    if format == "parquet":
        return read_parquet(spark, path)
    if format == "csv":
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    if format == "json":
        return spark.read.json(path)
    if format in _PLAIN_FORMATS:
        return spark.read.format(format).load(path)
    if format in _TABLE_FORMATS:
        try:
            return spark.read.format(format).load(path)
        except Exception as e:  # package not on the classpath
            raise ValueError(
                f"source format {format!r} needs its Spark package on the "
                f"classpath (e.g. spark.jars.packages): {e}"
            ) from e
    raise ValueError(f"unsupported source format: {format!r}")
