from pyspark.sql import functions as F


def model(dbt, session):
    """Python model: per-status customer order stats off the customers
    mart — full DataFrame API, fused into the same Catalyst plan."""
    dbt.config(materialized="view")
    customers = dbt.ref("customers")
    return (
        customers.groupBy("number_of_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("number_of_orders")
    )
