from dbt_osmosis_spark.functions.numeric import dec_sum, exact_avg

__all__ = ["dec_sum", "exact_avg"]
