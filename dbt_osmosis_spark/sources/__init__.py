from dbt_osmosis_spark.sources.parquet import read_parquet
from dbt_osmosis_spark.sources.seeds import load_seed

__all__ = ["read_parquet", "load_seed"]
