"""dbt-osmosis-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of z3z1ma/dbt-osmosis.

The reference (dbt-osmosis) compiles Jinja-SQL dbt models and delegates
execution to a warehouse adapter (reference:
src/dbt_osmosis/core/sql_operations.py:60-71). Here, Spark *is* the warehouse:
models compile to Spark SQL, execute through Catalyst, and the Spark catalog
is the introspection source. Beyond the reference surface, the engine ships
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.
"""

from dbt_osmosis_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
